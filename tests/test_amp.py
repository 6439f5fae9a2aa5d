"""bf16-AMP training (--use_half_precision, the reference's AMP default:
main.py:37, CWFA.py:13,613,813).

AMP discipline under test: master params / gradients / optimizer state /
losses / BatchNorm statistics stay fp32 while network activations ride
bf16 inside the optimizer-step programs.  The reference trains fp16+
GradScaler; bf16 needs no scaler (documented divergence, SURVEY §2.6)."""

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

ND, SIDE, IMG, NL, VIEW = 8, 16, 64, 4, 16


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("amp"))
    info = make_synthetic_dataset(root, n_fish=1, n_frames=3, n_depths=ND,
                                  vol_side=SIDE, img_size=IMG,
                                  n_lenslets=NL, view_size=VIEW)
    ds = load_xlfm_data(info["fish_dirs"][0] + "/SLNet_preprocessed",
                        info["lenslet_file"], vol_shape=(SIDE, SIDE, ND),
                        img_shape=(IMG, IMG), images_to_use=[0, 1, 2],
                        n_depths_to_fill=ND, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    vidx = make_view_indices(ds.lenslet_coords, (IMG, IMG), (VIEW, VIEW))
    return {"cat": cat, "vidx": vidx, "stats": cat.get_statistics()}


def _cfg(**kw):
    return CWFAConfig(n_depths=ND, volume_side_size=VIEW, n_lenslets=NL,
                      INN_max_down_steps=3, INN_n_blocks=2,
                      INN_internal_chans=8, INN_cond_chans=4, epochs=3,
                      eval_every=100, save_tiff_volumes=0, batch_size=2,
                      **kw).decode_lrs()


def test_bf16_training_tracks_fp32(rig):
    """Same seed, 3 epochs (LRNN stage + both flow stages): the bf16-AMP
    trainer's epoch losses track the fp32 trainer's within bf16 activation
    noise, every loss is finite, and master params / optimizer momenta stay
    fp32 in BOTH modes."""
    out = {}
    for hp in (0, 1):
        cfg = _cfg(use_half_precision=hp)
        tr = CWFATrainer(CWFAModel.build(cfg), rig["stats"], rig["vidx"])
        losses = [float(tr.train_epoch(rig["cat"], ep)) for ep in range(3)]
        assert np.all(np.isfinite(losses))
        for leaf in jax.tree_util.tree_leaves(tr.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(tr.opt_flow):
            if hasattr(leaf, "dtype") and leaf.dtype.kind == "f":
                assert leaf.dtype == jnp.float32
        out[hp] = losses
    np.testing.assert_allclose(out[1], out[0], rtol=0.05)


def test_bf16_flag_off_unchanged(rig):
    """use_half_precision=0 must be the exact fp32 program: two fp32
    trainers from the same seed produce bit-identical first-epoch losses
    (guards against the AMP wiring leaking casts into the fp32 path)."""
    cfg = _cfg(use_half_precision=0)
    l0 = float(CWFATrainer(CWFAModel.build(cfg), rig["stats"], rig["vidx"])
               .train_epoch(rig["cat"], 0))
    l1 = float(CWFATrainer(CWFAModel.build(cfg), rig["stats"], rig["vidx"])
               .train_epoch(rig["cat"], 0))
    assert l0 == l1


def test_bf16_conv_grads_fp32_and_close():
    """The conv wrappers' accumulate-dtype switch (nn._acc_dtype): bf16
    inputs must be differentiable (the old unconditional f32
    preferred_element_type broke the conv transpose rule with mixed
    dtypes), gradients must come back fp32 through the per-layer param
    casts, and must agree with the fp32 gradient to bf16 tolerance."""
    from cwfa_tpu import nn as cnn
    key = jax.random.PRNGKey(0)
    p = cnn.init_conv2d(key, 3, 8, 3)
    x32 = jax.random.normal(jax.random.fold_in(key, 1), (2, 3, 8, 8),
                            jnp.float32)

    def loss(p, x):
        return jnp.sum(cnn.conv2d(p, x).astype(jnp.float32) ** 2)

    g32 = jax.grad(loss)(p, x32)
    g16 = jax.grad(loss)(p, x32.astype(jnp.bfloat16))
    for a, b in zip(jax.tree_util.tree_leaves(g16),
                    jax.tree_util.tree_leaves(g32)):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=0.1)
