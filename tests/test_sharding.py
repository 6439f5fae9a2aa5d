"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: data-parallel
training step and data+space-sharded reconstruction compile, run, and agree
with the single-device result."""

import chex
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.models.cwfa_model import CWFAModel
from cwfa_tpu.parallel import (make_mesh, batch_sharding, replicate,
                               sharded_reconstruct, sharded_train_step)

N_DEPTHS, SPATIAL, NLENS = 8, 16, 4


@pytest.fixture(scope="module")
def tiny():
    cfg = CWFAConfig(n_depths=N_DEPTHS, volume_side_size=SPATIAL,
                     n_lenslets=NLENS, INN_max_down_steps=3, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4).decode_lrs()
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    return cfg, model, params, mstate


def _mean_caches(model, b=1):
    nf = model.n_flow_steps
    out = []
    for k in range(nf + 1):
        c = model.cfg.n_depths // (2 ** (k + 1))
        out.append(jnp.zeros((b, c, SPATIAL, SPATIAL), jnp.float32))
    return out


def test_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_reconstruct_matches_single(tiny):
    cfg, model, params, mstate = tiny
    rng = np.random.RandomState(0)
    views = jnp.asarray(rng.randn(8, NLENS, SPATIAL, SPATIAL).astype(np.float32))
    mcs = _mean_caches(model)
    ref = model.reconstruct(params, mstate, views,
                            [jnp.broadcast_to(c, (8,) + c.shape[1:])
                             for c in mcs],
                            z_temperature=0.0, train=False, lrnn_train=False)
    mesh = make_mesh(n_data=4, n_space=2)
    got = sharded_reconstruct(mesh, model, params, mstate, views, mcs,
                              key=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)
    assert got.shape == (8, N_DEPTHS, SPATIAL, SPATIAL)


def test_dp_flow_train_step(tiny):
    """A flow train step over a (4,2) mesh: loss finite, params update, and
    the gradient all-reduce is emitted implicitly (result equals the
    unsharded step on the same batch)."""
    import optax
    from cwfa_tpu.models.cwf import cwf_step_forward

    cfg, model, params, mstate = tiny
    k = 0
    spec = model.step_specs[k]
    tx = optax.lion(1e-4)
    opt = tx.init(params["flow"][k])

    def step(flow_k, opt_state, gt_k, c_views, c_mean):
        def loss_fn(fk):
            z, avg, logdet = cwf_step_forward(spec, fk, gt_k, c_views, c_mean)
            prior = 0.5 * jnp.sum(z.astype(jnp.float32) ** 2)
            return (prior - jnp.mean(logdet)) / float(gt_k.size)
        loss, g = jax.value_and_grad(loss_fn)(flow_k)
        up, opt_state = tx.update(g, opt_state, flow_k)
        return optax.apply_updates(flow_k, up), opt_state, loss

    rng = np.random.RandomState(1)
    gt = jnp.asarray(rng.randn(8, N_DEPTHS, SPATIAL, SPATIAL).astype(np.float32))
    cv = jnp.asarray(rng.randn(8, N_DEPTHS // 2, SPATIAL, SPATIAL).astype(np.float32))
    cm = jnp.asarray(rng.randn(8, N_DEPTHS // 2, SPATIAL, SPATIAL).astype(np.float32))

    ref_p, _, ref_loss = jax.jit(step)(params["flow"][k], opt, gt, cv, cm)

    mesh = make_mesh(n_data=8, n_space=1)
    wrapped = sharded_train_step(mesh, jax.jit(step), batch_args_ix={2, 3, 4})
    got_p, _, got_loss = wrapped(params["flow"][k], opt, gt, cv, cm)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got_p),
                    jax.tree_util.tree_leaves(ref_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_depth_sharded_deconvolution():
    """RL deconvolution with the depth axis sharded over the mesh matches the
    single-device result (the depth sum becomes an XLA collective)."""
    import jax.numpy as jnp
    from cwfa_tpu.ops.fft_conv import precompute_otf, xlfm_forward_project
    from cwfa_tpu.ops.deconv import xlfm_deconvolve, xlfm_deconvolve_sharded

    d, s, p = 8, 16, 32
    rng = np.random.RandomState(3)
    psf = np.abs(rng.rand(1, d, p, p)).astype(np.float32)
    psf /= psf.sum(axis=(-2, -1), keepdims=True)
    otf, full_hw = precompute_otf(jnp.asarray(psf), (s, s))
    # batch of 2 frames at different intensity scales: the RL ratio-clamp
    # median must stay a PER-FRAME statistic on the sharded path too
    vol = np.abs(rng.rand(2, d, s, s)).astype(np.float32)
    vol[1] *= 300.0
    vol[1, :, 6:, :] = 0.0
    vol = jnp.asarray(vol)
    img = xlfm_forward_project(vol, otf, full_hw, psf_hw=(p, p))

    ref, _ = xlfm_deconvolve(otf, img, n_iter=3, obj_hw=(s, s), roi_depths=d)
    mesh = make_mesh(n_data=1, n_space=8)
    got, _ = xlfm_deconvolve_sharded(mesh, otf, img, n_iter=3, obj_hw=(s, s),
                                     roi_depths=d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_sharded_train_step_placement_fallbacks():
    """sharded_train_step's per-leaf placement: batch leaves with leading
    dims not divisible by 'data' (ragged final batch), or row dims not
    divisible by 'space', fall back to the widest legal sharding instead of
    crashing; non-array leaves (static ints, None) pass through.  The
    wrapped program stays numerically identical in every case."""
    mesh = make_mesh(n_data=2, n_space=2)

    @jax.jit
    def step(w, x, flag):
        return (w * x).sum(axis=(1, 2, 3)) + flag

    wrapped = sharded_train_step(mesh, step, {1})
    w = jnp.float32(2.0)
    for shape in [(4, 3, 8, 8),    # fully shardable (data+space)
                  (4, 3, 7, 8),    # rows % space != 0 -> data-only
                  (3, 3, 8, 8),    # batch % data != 0 -> replicate
                  (1, 3, 7, 8)]:   # neither divides
        x = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
        np.testing.assert_allclose(np.asarray(wrapped(w, x, 5)),
                                   np.asarray(step(w, x, 5)), rtol=1e-6)


def test_trainer_on_mesh_matches_single_device(tmp_path):
    """CWFATrainer(mesh=...) wraps every jitted program for SPMD (batch over
    'data', rows over 'space', XLA-emitted gradient all-reduce).  SPMD
    partitioning is semantics-preserving, so epoch losses must match the
    meshless trainer's; the ragged final batch (B=1 on a 2-wide data axis)
    exercises the per-leaf replication fallback."""
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_synthetic_dataset, make_view_indices)
    from cwfa_tpu.engine.trainer import CWFATrainer

    nd, side, img, nl, view = 8, 16, 64, 4, 16
    info = make_synthetic_dataset(str(tmp_path), n_fish=1, n_frames=3,
                                  n_depths=nd, vol_side=side, img_size=img,
                                  n_lenslets=nl, view_size=view)
    ds = load_xlfm_data(info["fish_dirs"][0] + "/SLNet_preprocessed",
                        info["lenslet_file"], vol_shape=(side, side, nd),
                        img_shape=(img, img), images_to_use=[0, 1, 2],
                        n_depths_to_fill=nd, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    cfg = CWFAConfig(n_depths=nd, volume_side_size=view, n_lenslets=nl,
                     INN_max_down_steps=3, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4, epochs=3,
                     eval_every=100, save_tiff_volumes=0,
                     batch_size=2).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(ds.lenslet_coords, (img, img), (view, view))
    stats = cat.get_statistics()

    mesh = make_mesh(n_data=2, n_space=2)
    tr_m = CWFATrainer(model, stats, vidx, mesh=mesh)
    tr_s = CWFATrainer(model, stats, vidx)
    # same model + seed -> identical initial params
    chex.assert_trees_all_equal(tr_m.params, tr_s.params)

    for ep in range(3):                  # LRNN stage + both flow stages
        lm = float(tr_m.train_epoch(cat, ep))
        ls = float(tr_s.train_epoch(cat, ep))
        assert np.isfinite(lm)
        np.testing.assert_allclose(lm, ls, rtol=2e-3, err_msg=f"epoch {ep}")

    # parameters track within Lion's step scale (sign updates can flip on
    # reduction-order noise of near-zero gradient components; anything
    # beyond a few lr is a wiring bug, e.g. double-counted gradients)
    lr = max(cfg.learning_rate, cfg.learning_rate_cond,
             cfg.learning_rate_first_step)
    for pm, ps in zip(jax.tree.leaves(tr_m.params),
                      jax.tree.leaves(tr_s.params)):
        np.testing.assert_allclose(np.asarray(pm), np.asarray(ps),
                                   atol=6 * lr, rtol=0)

    # eval-mode reconstruction through the wrapped program: no optimizer
    # in the loop -> tight agreement
    views_n = jnp.asarray(np.random.RandomState(0)
                          .randn(2, nl, view, view).astype(np.float32))
    mcs = [jnp.zeros((2, nd // (2 ** (k + 1)), view, view), jnp.float32)
           for k in range(model.n_flow_steps + 1)]
    key = jax.random.PRNGKey(7)
    vm, _ = tr_m._recon_eval(tr_m.params, tr_m.mstate, views_n, mcs, key)
    vs, _ = tr_s._recon_eval(tr_m.params, tr_m.mstate, views_n, mcs, key)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(vs),
                               rtol=1e-4, atol=1e-5)
