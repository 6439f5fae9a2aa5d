"""Condition-network tests: banded-dense conv3d reformulation must match the
direct NCDHW path bit-for-bit (same math, different schedule)."""

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.models.cond_net import (init_cond_network, cond_network,
                                      _depth_band)


def test_depth_band_structure():
    b = _depth_band(4)
    # c=0 touches c'=0 (dc=1), c'=1 (dc=2); dc=0 clipped
    assert b[0, 0, 1] == 1 and b[0, 1, 2] == 1 and b[0, :, 0].sum() == 0
    assert b[2, 1, 0] == 1 and b[2, 2, 1] == 1 and b[2, 3, 2] == 1
    assert b.sum() == 4 * 3 - 2


def test_banded_matches_direct_eval():
    key = jax.random.PRNGKey(0)
    params = init_cond_network(key, 5, 6, chans_3d=4)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 5, 12, 12).astype(np.float32))
    direct = cond_network(params, x, conv3d_impl="direct")
    banded = cond_network(params, x, conv3d_impl="banded")
    np.testing.assert_allclose(np.asarray(banded), np.asarray(direct),
                               atol=2e-4, rtol=1e-4)


def test_banded_matches_direct_train_dropout():
    key = jax.random.PRNGKey(1)
    params = init_cond_network(key, 3, 4, chans_3d=4)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(1, 3, 8, 8).astype(np.float32))
    rng = jax.random.PRNGKey(7)
    direct = cond_network(params, x, train=True, rng=rng,
                          conv3d_impl="direct")
    banded = cond_network(params, x, train=True, rng=rng,
                          conv3d_impl="banded")
    np.testing.assert_allclose(np.asarray(banded), np.asarray(direct),
                               atol=2e-4, rtol=1e-4)


def test_depthbatch_matches_direct_eval():
    """The depth-in-batch direct form (the production path for D>=24) must
    match the NCDHW direct path."""
    key = jax.random.PRNGKey(4)
    params = init_cond_network(key, 5, 24, chans_3d=4)
    x = jnp.asarray(np.random.RandomState(5)
                    .randn(2, 5, 12, 12).astype(np.float32))
    direct = cond_network(params, x, conv3d_impl="direct")
    db = cond_network(params, x, conv3d_impl="depthbatch")
    auto = cond_network(params, x)          # auto always picks depthbatch
    np.testing.assert_allclose(np.asarray(db), np.asarray(direct),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(direct),
                               atol=2e-4, rtol=1e-4)


def test_depthtile_matches_direct_eval_and_train():
    """The depth-tiled dense conv_a (production path for D%4==0, D>=24)
    must match the NCDHW direct path, in eval and under dropout."""
    key = jax.random.PRNGKey(14)
    params = init_cond_network(key, 5, 24, chans_3d=4)
    x = jnp.asarray(np.random.RandomState(15)
                    .randn(2, 5, 12, 12).astype(np.float32))
    direct = cond_network(params, x, conv3d_impl="direct")
    dt = cond_network(params, x, conv3d_impl="depthtile")
    np.testing.assert_allclose(np.asarray(dt), np.asarray(direct),
                               atol=2e-4, rtol=1e-4)
    rng = jax.random.PRNGKey(16)
    db_t = cond_network(params, x, train=True, rng=rng,
                        conv3d_impl="depthbatch")
    dt_t = cond_network(params, x, train=True, rng=rng,
                        conv3d_impl="depthtile")
    np.testing.assert_allclose(np.asarray(dt_t), np.asarray(db_t),
                               atol=2e-4, rtol=1e-4)


def test_depthbatch_matches_banded_train_dropout():
    key = jax.random.PRNGKey(5)
    params = init_cond_network(key, 3, 8, chans_3d=4)
    x = jnp.asarray(np.random.RandomState(6)
                    .randn(2, 3, 8, 8).astype(np.float32))
    rng = jax.random.PRNGKey(9)
    banded = cond_network(params, x, train=True, rng=rng,
                          conv3d_impl="banded")
    db = cond_network(params, x, train=True, rng=rng,
                      conv3d_impl="depthbatch")
    np.testing.assert_allclose(np.asarray(db), np.asarray(banded),
                               atol=2e-4, rtol=1e-4)


def test_grad_flows_through_depthbatch():
    key = jax.random.PRNGKey(6)
    params = init_cond_network(key, 3, 24, chans_3d=4)
    x = jnp.asarray(np.random.RandomState(7)
                    .randn(1, 3, 8, 8).astype(np.float32))

    def loss(p):
        return jnp.sum(cond_network(p, x, conv3d_impl="depthbatch") ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_grad_flows_through_banded():
    key = jax.random.PRNGKey(2)
    params = init_cond_network(key, 3, 4, chans_3d=4)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 3, 8, 8).astype(np.float32))

    def loss(p):
        return jnp.sum(cond_network(p, x) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_batched_cond_nets_match_separate():
    from cwfa_tpu.models.cond_net import cond_networks_batched
    import jax
    import jax.numpy as jnp
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    plist = [init_cond_network(keys[0], 5, 8, chans_3d=4),
             init_cond_network(keys[1], 5, 4, chans_3d=4),
             init_cond_network(keys[2], 5, 2, chans_3d=4)]
    x = jnp.asarray(np.random.RandomState(4)
                    .randn(2, 5, 8, 8).astype(np.float32))
    batched = cond_networks_batched(plist, x)
    for p, got in zip(plist, batched):
        want = cond_network(p, x, conv3d_impl="banded")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


def test_int8_cond3d_tolerance():
    """int8 y-intermediate path (per-feature calibrated) tracks the f32
    batched path within quantization tolerance."""
    import jax.numpy as jnp
    from cwfa_tpu.models.cond_net import (cond_networks_batched,
                                          quantize_cond_networks)
    key = jax.random.PRNGKey(7)
    plist = [init_cond_network(jax.random.fold_in(key, i), 5, d, chans_3d=8)
             for i, d in enumerate((8, 4))]
    x = jnp.asarray(np.random.RandomState(3)
                    .randn(2, 5, 16, 16).astype(np.float32))
    ref = cond_networks_batched(plist, x)
    packs = quantize_cond_networks(plist, x)
    q = cond_networks_batched(plist, x, cond_q=packs)
    for r, o in zip(ref, q):
        r, o = np.asarray(r), np.asarray(o)
        rel = np.linalg.norm(o - r) / max(np.linalg.norm(r), 1e-9)
        assert rel < 0.05, rel
