"""End-to-end engine tests on a miniature synthetic rig:
- config 2 milestone: LRNN MSE training step reduces loss,
- full coarse-to-fine fit() over all stages,
- evaluation metrics + checkpoint save/load roundtrip.
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


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    info = make_synthetic_dataset(root, n_fish=1, n_frames=3,
                                  n_depths=N_DEPTHS, vol_side=VOL_SIDE,
                                  img_size=IMG, n_lenslets=NLENS,
                                  view_size=VIEW)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    ds = load_xlfm_data(fish, info["lenslet_file"],
                        vol_shape=(VOL_SIDE, VOL_SIDE, N_DEPTHS),
                        img_shape=(IMG, IMG), images_to_use=[0, 1, 2],
                        n_depths_to_fill=N_DEPTHS)
    cat = ConcatXLFMDataset(ds)
    stats = cat.get_statistics()
    cfg = CWFAConfig(
        n_depths=N_DEPTHS, volume_side_size=VIEW, n_lenslets=NLENS,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=8,
        INN_cond_chans=4, epochs=6, eval_every=6,
        learning_rate=221, learning_rate_first_step=80,
        learning_rate_cond=845).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(ds.lenslet_coords, (IMG, IMG), (VIEW, VIEW))
    return {"cat": cat, "stats": stats, "cfg": cfg, "model": model,
            "vidx": vidx}


def test_model_shapes(rig):
    model, cfg = rig["model"], rig["cfg"]
    assert model.n_flow_steps == 2
    # flow step 0: 16 depths -> 8+8; step 1: 8 -> 4+4; LRNN outputs 4 depths
    assert model.step_specs[0].d_in == 16
    assert model.step_specs[1].d_in == 8
    assert model.lrnn_spec.n_depths == 4


def test_full_fit_and_eval(rig, tmp_path):
    trainer = CWFATrainer(rig["model"], rig["stats"], rig["vidx"],
                          output_path=str(tmp_path / "ckpt"))
    cat = rig["cat"]

    # stage schedule: epochs 0-1 -> LRNN (stage 2), 2-3 -> flow 1, 4-5 -> flow 0
    assert trainer.stage_for_epoch(0) == 2
    assert trainer.stage_for_epoch(2) == 1
    assert trainer.stage_for_epoch(4) == 0

    # config-2 milestone: LRNN stage epochs run with finite losses (the
    # loss-DECREASE contract lives in test_lrnn_loss_decreases)
    l0 = trainer.train_epoch(cat, 0)
    l1 = trainer.train_epoch(cat, 1)
    assert np.isfinite(l0) and np.isfinite(l1)

    # remaining stages
    for ep in range(2, 6):
        loss = trainer.train_epoch(cat, ep)
        assert np.isfinite(loss)

    res = trainer.evaluate(cat, "train")
    assert len(res["psnr"]) == 3
    assert len(res["psnr"][0]) == 3          # levels 0..2
    assert all(np.isfinite(p) for row in res["psnr"] for p in row)
    assert all(t > 0 for t in res["times"])
    assert np.isfinite(np.asarray(res["nll"])).all()

    # checkpoints roundtrip
    trainer.save_checkpoints(epoch=5)
    t2 = CWFATrainer(rig["model"], rig["stats"], rig["vidx"])
    before = np.asarray(
        jax.tree_util.tree_leaves(t2.params["flow"][0])[0]).copy()
    loaded = t2.load_checkpoints(str(tmp_path / "ckpt"))
    assert sorted(loaded) == [1, 2, 3]
    after_tree = t2.params["flow"][0]
    want_tree = trainer.params["flow"][0]
    for a, w in zip(jax.tree_util.tree_leaves(after_tree),
                    jax.tree_util.tree_leaves(want_tree)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(w), atol=1e-6)


def test_lrnn_loss_decreases(rig):
    """Dedicated config-2 check: repeated LRNN steps on one sample shrink the
    reconstruction loss."""
    trainer = CWFATrainer(rig["model"], rig["stats"], rig["vidx"])
    cat = rig["cat"]
    losses = [trainer.train_epoch(cat, 0) for _ in range(4)]
    assert losses[-1] < losses[0]


def test_step_nll_batched_is_mean_of_per_sample(rig):
    """The training NLL (CWFA.py:966-978) must be the batch MEAN of the
    reference's per-sample objective: (0.5||z_b||^2 - logdet_b)/numel —
    regression for the batch-summed prior vs batch-averaged logdet bug
    (logdet was underweighted by B at batch_size>1)."""
    model = rig["model"]
    params, _ = model.init(jax.random.PRNGKey(0))
    k = 0
    spec = model.step_specs[k]
    rng = np.random.RandomState(0)
    B = 3
    gt = jnp.asarray(rng.randn(B, spec.d_in, spec.spatial, spec.spatial)
                     .astype(np.float32))
    cv = jnp.asarray(rng.randn(B, spec.c_flow, spec.spatial, spec.spatial)
                     .astype(np.float32))
    cm = jnp.asarray(rng.randn(B, spec.c_flow, spec.spatial, spec.spatial)
                     .astype(np.float32))
    nll_b, _ = model.step_nll(params, k, gt, cv, cm)
    per = [model.step_nll(params, k, gt[i:i + 1], cv[i:i + 1],
                          cm[i:i + 1])[0] for i in range(B)]
    np.testing.assert_allclose(float(nll_b),
                               float(np.mean([float(p) for p in per])),
                               rtol=1e-5)


def test_checkpoint_save_is_atomic_and_tmp_invisible(tmp_path):
    """save_step_checkpoint publishes via temp-file + os.replace (SURVEY
    §5.3): no temp residue after a clean save, and an orphaned temp from a
    crashed writer must be invisible to discovery (it would otherwise win
    the highest-epoch pick and fail the restore)."""
    import os
    from cwfa_tpu.engine.checkpoints import (discover_checkpoints,
                                             save_step_checkpoint)
    cfg = CWFAConfig(n_depths=4, volume_side_size=8, n_lenslets=4)
    out = str(tmp_path / "ck")
    save_step_checkpoint(out, step=1, epoch=3, cfg=cfg,
                         inn_params={"w": np.zeros(2, np.float32)})
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
    # orphan from a hypothetical crash, claiming a higher epoch
    orphan = os.path.join(out, ".model_step_1__ep_9.msgpack.tmp")
    with open(orphan, "wb") as f:
        f.write(b"half-written garbage")
    best = discover_checkpoints(out)
    assert best[1][0] == 3 and best[1][1].endswith(".msgpack")


def test_checkpoint_roundtrip_mstate_and_optimizer(rig, tmp_path):
    """Checkpoints must carry the LRNN UNet BatchNorm running statistics
    (mstate) and the per-step optimizer momenta; a restored trainer's
    eval-mode BatchNorm must use the TRAINED stats, and a resume keeps the
    Lion momenta instead of restarting them from zero."""
    out = str(tmp_path / "ck")
    tr = CWFATrainer(rig["model"], rig["stats"], rig["vidx"],
                     output_path=out, seed=11)
    # run every stage at least once so BN stats and all momenta move
    for epoch in range(rig["cfg"].epochs):
        tr.train_epoch(rig["cat"], epoch)
    tr.save_checkpoints(epoch=rig["cfg"].epochs - 1)

    tr2 = CWFATrainer(CWFAModel.build(rig["cfg"]), rig["stats"],
                      rig["vidx"], seed=99)
    tr2.load_checkpoints(out)

    for a, b in zip(jax.tree_util.tree_leaves(tr.mstate),
                    jax.tree_util.tree_leaves(tr2.mstate)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)
    # the stats actually moved during training (the restore is load-bearing)
    assert not np.allclose(
        np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(tr.mstate)]),
        np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(
                            CWFATrainer(CWFAModel.build(rig["cfg"]),
                                        rig["stats"], rig["vidx"],
                                        seed=11).mstate)]))
    # optimizer momenta restored (non-zero after training)
    for a, b in zip(jax.tree_util.tree_leaves(tr.opt_lrnn),
                    jax.tree_util.tree_leaves(tr2.opt_lrnn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for k in range(tr.model.n_flow_steps):
        for a, b in zip(jax.tree_util.tree_leaves(tr.opt_flow[k]),
                        jax.tree_util.tree_leaves(tr2.opt_flow[k])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)
    flat = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(tr2.opt_lrnn)
                           if np.asarray(x).size])
    assert np.abs(flat).max() > 0
