"""Structural tests for the graph-wiring flags (VERDICT round-1 item 4):

- force_last_step_NF  (ref CWFA.py:489-510,781,880): last pyramid stage is a
  flow step, not the LRNN — one extra CWF step exists, the reconstruction
  range extends through it, and the LRNN's parameters do not influence the
  output.
- force_all_steps_NF  (ref CWFA.py:157-161,892-894): the processed-views
  condition is zeroed at every flow step — reconstruction is invariant to the
  condition-network parameters, and training leaves cond params untouched.
- train_with_gt_low_res (ref CWFA.py:687,866-869): during training, the stage
  input of flow step k is the GT pyramid level k+1 (mode 1: all steps;
  mode 2: only step INN_max_down_steps-2).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                           make_synthetic_dataset, make_view_indices)
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel

N_DEPTHS, VOL_SIDE, IMG, NLENS, VIEW = 16, 32, 96, 4, 32


def _cfg(**kw):
    return CWFAConfig(
        n_depths=N_DEPTHS, volume_side_size=VIEW, n_lenslets=NLENS,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=8,
        INN_cond_chans=4, epochs=6, eval_every=6, **kw).decode_lrs()


def _recon_inputs(model, params, key=0):
    rng = np.random.RandomState(key)
    b = 1
    views = jnp.asarray(rng.randn(b, NLENS, VIEW, VIEW).astype(np.float32))
    nf = model.n_flow_steps
    caches = [jnp.asarray(rng.randn(
        b, N_DEPTHS // (2 ** (k + 1)), VIEW, VIEW).astype(np.float32))
        for k in range(nf + 1)]
    return views, caches


def test_force_last_step_nf_structure():
    cfg = _cfg(force_last_step_NF=1)
    model = CWFAModel.build(cfg)
    # one extra flow step at the coarsest level (d_in = 16/2^2 = 4)
    assert model.n_flow_steps == cfg.INN_max_down_steps == 3
    assert model.step_specs[-1].d_in == N_DEPTHS // 4
    params, mstate = model.init(jax.random.PRNGKey(0))
    assert len(params["cond"]) == 3

    views, caches = _recon_inputs(model, params)
    vol = model.reconstruct(params, mstate, views, caches)
    assert vol.shape == (1, N_DEPTHS, VIEW, VIEW)

    # the LRNN is out of the chain: zeroing its params changes nothing
    zeroed = {**params,
              "lrnn": jax.tree_util.tree_map(jnp.zeros_like, params["lrnn"])}
    vol2 = model.reconstruct(zeroed, mstate, views, caches)
    np.testing.assert_array_equal(np.asarray(vol), np.asarray(vol2))

    # forward NLL covers every step incl. the coarsest
    gt = jnp.asarray(np.random.RandomState(1).randn(
        1, N_DEPTHS, VIEW, VIEW).astype(np.float32))
    nlls, gt_cache, _, _ = model.forward_pyramid(params, gt)
    assert len(nlls) == 3
    assert gt_cache[-1].shape[1] == N_DEPTHS // 8


def test_force_last_step_nf_vs_default_differs():
    base = CWFAModel.build(_cfg())
    forced = CWFAModel.build(_cfg(force_last_step_NF=1))
    assert base.n_flow_steps == 2 and forced.n_flow_steps == 3


def test_force_all_steps_nf_zero_conditions():
    cfg = _cfg(force_all_steps_NF=1)
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    views, caches = _recon_inputs(model, params)
    vol = model.reconstruct(params, mstate, views, caches)

    # perturbing every cond net leaves the reconstruction bit-identical
    scrambled = {**params, "cond": jax.tree_util.tree_map(
        lambda x: x + 1.0, params["cond"])}
    vol2 = model.reconstruct(scrambled, mstate, views, caches)
    np.testing.assert_array_equal(np.asarray(vol), np.asarray(vol2))

    # without the flag the cond nets DO matter
    model0 = CWFAModel.build(_cfg())
    p0, s0 = model0.init(jax.random.PRNGKey(0))
    v0 = model0.reconstruct(p0, s0, views, caches)
    v1 = model0.reconstruct({**p0, "cond": jax.tree_util.tree_map(
        lambda x: x + 1.0, p0["cond"])}, s0, views, caches)
    assert float(jnp.max(jnp.abs(v0 - v1))) > 0


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_flags"))
    info = make_synthetic_dataset(root, n_fish=1, n_frames=2,
                                  n_depths=N_DEPTHS, vol_side=VOL_SIDE,
                                  img_size=IMG, n_lenslets=NLENS,
                                  view_size=VIEW)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    ds = load_xlfm_data(fish, info["lenslet_file"],
                        vol_shape=(VOL_SIDE, VOL_SIDE, N_DEPTHS),
                        img_shape=(IMG, IMG), images_to_use=[0, 1],
                        n_depths_to_fill=N_DEPTHS)
    cat = ConcatXLFMDataset(ds)
    vidx = make_view_indices(ds.lenslet_coords, (IMG, IMG), (VIEW, VIEW))
    return {"cat": cat, "stats": cat.get_statistics(), "vidx": vidx}


def _trainer(rig, **cfg_kw):
    cfg = _cfg(**cfg_kw)
    model = CWFAModel.build(cfg)
    return CWFATrainer(model, rig["stats"], rig["vidx"])


def test_train_with_gt_low_res_uses_gt_pyramid(rig):
    trainer = _trainer(rig, train_with_gt_low_res=1)

    calls = []
    orig = trainer._stage_input
    trainer._stage_input = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
    # epoch 4 -> stage 0 (a flow stage) with epochs=6, 3 stages
    loss = trainer.train_epoch(rig["cat"], 4)
    assert np.isfinite(loss)
    assert calls == []          # GT pyramid fed directly; no recompute

    # mode 0 control: the stage input IS recomputed
    trainer0 = _trainer(rig)
    calls0 = []
    orig0 = trainer0._stage_input
    trainer0._stage_input = lambda *a, **k: (calls0.append(a),
                                             orig0(*a, **k))[1]
    loss0 = trainer0.train_epoch(rig["cat"], 4)
    assert np.isfinite(loss0)
    assert len(calls0) == len(rig["cat"])


def test_train_with_gt_low_res_mode2_only_coarse_step(rig):
    trainer = _trainer(rig, train_with_gt_low_res=2)
    calls = []
    orig = trainer._stage_input
    trainer._stage_input = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
    # stage 1 == INN_max_down_steps-2: GT fed (no _stage_input calls)
    trainer.train_epoch(rig["cat"], 2)
    assert calls == []
    # stage 0: normal recompute path
    trainer.train_epoch(rig["cat"], 4)
    assert len(calls) == len(rig["cat"])


def test_force_all_steps_nf_training_leaves_cond_untouched(rig):
    trainer = _trainer(rig, force_all_steps_NF=1)
    before = jax.tree_util.tree_map(np.asarray, trainer.params["cond"])
    trainer.train_epoch(rig["cat"], 4)     # flow stage 0
    after = trainer.params["cond"]
    for b, a in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(b, np.asarray(a))


def test_force_last_step_nf_training_all_stages(rig):
    """With the flag every stage is a flow stage; a full fit() runs and the
    LRNN params never change."""
    trainer = _trainer(rig, force_last_step_NF=1)
    lrnn_before = jax.tree_util.tree_map(np.asarray, trainer.params["lrnn"])
    for ep in range(6):
        stage = trainer.stage_for_epoch(ep)
        assert stage < trainer.model.n_flow_steps   # never the LRNN stage
        loss = trainer.train_epoch(rig["cat"], ep)
        assert np.isfinite(loss)
    for b, a in zip(jax.tree_util.tree_leaves(lrnn_before),
                    jax.tree_util.tree_leaves(trainer.params["lrnn"])):
        np.testing.assert_array_equal(b, np.asarray(a))
