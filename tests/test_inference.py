"""Inference-pipeline equivalence tests.

The XLFMReconstructor applies inference-only rewrites of the reconstruction
program (precomputed LRNN mean-branch; later: paired/quantized towers).
Each rewrite must reproduce the plain ``model.reconstruct`` output.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.data.views import make_view_indices, extract_views
from cwfa_tpu.engine.inference import XLFMReconstructor
from cwfa_tpu.models.cwfa_model import CWFAModel
from cwfa_tpu.models.lrnn import lrnn_mean_branch

N_DEPTHS, VIEW, IMG, NLENS = 16, 32, 96, 4


def _cfg(**kw):
    return CWFAConfig(
        n_depths=N_DEPTHS, volume_side_size=VIEW, n_lenslets=NLENS,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=8,
        INN_cond_chans=4, **kw).decode_lrs()


def _setup(cfg):
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    coords = np.array([[24, 24], [24, 72], [72, 24], [72, 72]])
    vidx = make_view_indices(coords, (IMG, IMG), (VIEW, VIEW))
    nf = model.n_flow_steps
    caches = [jnp.asarray(rng.randn(
        1, N_DEPTHS // (2 ** (k + 1)), VIEW, VIEW).astype(np.float32))
        for k in range(nf + 1)]
    stats = DatasetStatistics(10.0, 5.0, 10.0, 5.0, 1.0, 0.5)
    frames = jnp.asarray(rng.rand(2, IMG, IMG).astype(np.float32) * 100)
    return model, params, mstate, vidx, caches, stats, frames


def test_mean_branch_cache_matches_inline():
    """Precomputed ConvNeXt mean-branch == per-frame inline computation."""
    cfg = _cfg()
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    recon = XLFMReconstructor(model, params, mstate, stats, vidx, caches,
                              deterministic=True)
    assert recon._mean_branch is not None
    out_cached = np.asarray(recon(frames))

    # inline path: plain model.reconstruct on the same normalized views
    views = extract_views(frames, vidx)
    views_n = (views - stats.mean_imgs) / stats.std_imgs
    b = frames.shape[0]
    mcs = [jnp.broadcast_to(c, (b,) + c.shape[1:]) for c in caches]
    vol = model.reconstruct(params, mstate, views_n, mcs,
                            z_temperature=cfg.INN_z_temperature,
                            rng=None, train=False, lrnn_train=False,
                            n_samples=cfg.INN_n_samples)
    out_inline = np.asarray(vol * stats.std_vols + stats.mean_vols)
    np.testing.assert_allclose(out_cached, out_inline, rtol=1e-5, atol=1e-5)


def _rel_to_f32(cfg_kwargs, **recon_kwargs):
    cfg = _cfg(**cfg_kwargs)
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    ref = XLFMReconstructor(model, params, mstate, stats, vidx, caches,
                            deterministic=True)
    q = XLFMReconstructor(model, params, mstate, stats, vidx, caches,
                          deterministic=True, calib_frames=frames,
                          **recon_kwargs)
    out_f32 = np.asarray(ref(frames), np.float64)
    out_q = np.asarray(q(frames), np.float64)
    rel = (np.linalg.norm(out_q - out_f32)
           / max(np.linalg.norm(out_f32 - out_f32.mean()), 1e-9))
    return q, rel


def test_int8_towers_match_f32_pipeline():
    """use_int8_towers routes the paired coupling towers through the fused
    int8 kernel (ops/qtower); the reconstruction must stay close to the f32
    pipeline (the PSNR guard for VERDICT round-2 item #2)."""
    q, rel = _rel_to_f32({}, use_int8_towers=True)
    assert any(p is not None for p in q._qpacks)
    assert rel < 0.05, f"int8 tower pipeline relative error {rel:.4f}"


def test_int8_unet_matches_f32_pipeline():
    """use_int8 quantizes the LRNN UNet (models/unet int8 path — the
    round-2 throughput win); PSNR guard vs the f32 pipeline."""
    q, rel = _rel_to_f32({}, use_int8=True)
    assert q._unet_q is not None
    assert rel < 0.05, f"int8 UNet pipeline relative error {rel:.4f}"


def test_paired_input_towers_match_per_step():
    """Cross-step pairing of the input-block towers (models/cwf.
    input_tower_s_raw) is numerics-identical to the per-step path."""
    cfg = _cfg()
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    views = extract_views(frames, vidx)
    views_n = ((views - stats.mean_imgs) / stats.std_imgs).astype(jnp.float32)
    b = frames.shape[0]
    mcs = [jnp.broadcast_to(c, (b,) + c.shape[1:]) for c in caches]
    kw = dict(z_temperature=cfg.INN_z_temperature, rng=None, train=False,
              lrnn_train=False, n_samples=cfg.INN_n_samples)
    v_plain = model.reconstruct(params, mstate, views_n, mcs,
                                pair_input_towers=False, **kw)
    for mode in (True, "tail", "mid", "hoist"):
        v_m = model.reconstruct(params, mstate, views_n, mcs,
                                pair_input_towers=mode, **kw)
        np.testing.assert_allclose(np.asarray(v_m), np.asarray(v_plain),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"mode={mode}")


def test_multi_sample_averaging():
    """n_samples>1 (reference CWFA.py:904,913-914): at temperature 0 the
    averaged samples are identical, so the result equals n_samples=1; at
    temperature>0 the path must run and stay finite."""
    cfg = _cfg()
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    views = extract_views(frames, vidx)
    views_n = ((views - stats.mean_imgs) / stats.std_imgs).astype(jnp.float32)
    b = frames.shape[0]
    mcs = [jnp.broadcast_to(c, (b,) + c.shape[1:]) for c in caches]
    v1 = model.reconstruct(params, mstate, views_n, mcs, z_temperature=0.0,
                           rng=None, train=False, lrnn_train=False,
                           n_samples=1)
    v2 = model.reconstruct(params, mstate, views_n, mcs, z_temperature=0.0,
                           rng=None, train=False, lrnn_train=False,
                           n_samples=2)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                               rtol=2e-5, atol=2e-5)
    vt = model.reconstruct(params, mstate, views_n, mcs, z_temperature=0.5,
                           rng=jax.random.PRNGKey(3), train=False,
                           lrnn_train=False, n_samples=2)
    assert np.isfinite(np.asarray(vt)).all()
    # regression: batch-1 mean caches (make_mean_caches form) with b>1 AND
    # n_samples>1 — c_mean must broadcast to b BEFORE the n_samples tile
    assert frames.shape[0] > 1
    v2c = model.reconstruct(params, mstate, views_n, caches,
                            z_temperature=0.0, rng=None, train=False,
                            lrnn_train=False, n_samples=2)
    np.testing.assert_allclose(np.asarray(v2c), np.asarray(v1),
                               rtol=2e-5, atol=2e-5)


def test_mean_branch_is_frame_independent():
    """The branch only depends on the mean cache, not on frames/batch."""
    cfg = _cfg()
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    nf = model.n_flow_steps
    mb1 = lrnn_mean_branch(model.lrnn_spec, params["lrnn"], caches[nf - 1])
    mb4 = lrnn_mean_branch(
        model.lrnn_spec, params["lrnn"],
        jnp.broadcast_to(caches[nf - 1], (4,) + caches[nf - 1].shape[1:]))
    np.testing.assert_allclose(np.asarray(mb4),
                               np.broadcast_to(np.asarray(mb1), mb4.shape),
                               rtol=1e-5, atol=1e-6)


def test_reconstruct_broadcasts_batch1_mean_caches():
    """Batch-1 mean caches (one per fish) must work for ANY batch size and
    every reconstruct branch — regression: the n_samples==1 path with
    train=True crashed in the input-block concatenate at batch>1."""
    cfg = _cfg()
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    views = extract_views(frames, vidx)
    views_n = ((views - stats.mean_imgs) / stats.std_imgs)
    # train=True disables the input-tower pairing precompute -> the raw
    # _input_block path that concatenates c_mean with c_views
    vol = model.reconstruct(params, mstate, views_n, caches,
                            z_temperature=0.0, train=True,
                            rng=jax.random.PRNGKey(1))
    assert vol.shape[0] == views_n.shape[0] == 2
    assert np.isfinite(np.asarray(vol)).all()
    # batch-matched caches give the identical program output
    caches_b = [jnp.broadcast_to(c, (2,) + c.shape[1:]) for c in caches]
    vol_b = model.reconstruct(params, mstate, views_n, caches_b,
                              z_temperature=0.0, train=True,
                              rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(vol), np.asarray(vol_b),
                               rtol=1e-6, atol=1e-6)


def test_int8_requires_deterministic():
    """use_int8 + deterministic=False would silently run the bf16 UNet
    (lrnn routes to the int8 pack only when not train) — must raise."""
    import pytest
    cfg = _cfg()
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    with pytest.raises(ValueError, match="deterministic"):
        XLFMReconstructor(model, params, mstate, stats, vidx, caches,
                          deterministic=False, use_int8=True,
                          calib_frames=np.asarray(frames))


def test_latency_ms_batch1():
    """latency_ms measures single-frame calls: returns (p50, min) floats,
    p50 >= min > 0, and rejects batches (the reference headline it mirrors
    is a per-frame latency, README.md:29)."""
    import pytest
    cfg = _cfg()
    model, params, mstate, vidx, caches, stats, frames = _setup(cfg)
    recon = XLFMReconstructor(model, params, mstate, stats, vidx, caches,
                              deterministic=True)
    p50, mn = recon.latency_ms(frames[:1], n=3)
    assert p50 >= mn > 0.0
    with pytest.raises(AssertionError):
        recon.latency_ms(frames, n=1)
