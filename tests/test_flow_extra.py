"""Round-trip + log-det tests for the extended invertible-op library."""

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.flow import extra as fx


def test_fixed_linear_roundtrip():
    rng = np.random.RandomState(0)
    m = rng.randn(4, 4).astype(np.float32) + 3 * np.eye(4, dtype=np.float32)
    p = fx.init_fixed_linear(m, rng.randn(4).astype(np.float32))
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    y, jf = fx.fixed_linear(p, x)
    x2, jr = fx.fixed_linear(p, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    sign, want = np.linalg.slogdet(m)
    np.testing.assert_allclose(np.asarray(jf), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jf), -np.asarray(jr))


def test_fixed_1x1_conv_roundtrip():
    rng = np.random.RandomState(1)
    m = rng.randn(3, 3).astype(np.float32) + 2 * np.eye(3, dtype=np.float32)
    p = fx.init_fixed_linear(m)
    x = jnp.asarray(rng.randn(1, 3, 4, 4).astype(np.float32))
    y, jf = fx.fixed_1x1_conv(p, x)
    x2, jr = fx.fixed_1x1_conv(p, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    _, ld = np.linalg.slogdet(m)
    np.testing.assert_allclose(np.asarray(jf), ld * 16, rtol=1e-4)


def test_irevnet_roundtrip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 3, 4, 4).astype(np.float32))
    y, _ = fx.irevnet_downsampling(x)
    assert y.shape == (2, 12, 2, 2)
    x2, _ = fx.irevnet_downsampling(y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x))
    u, _ = fx.irevnet_upsampling(y)
    assert u.shape == x.shape


def test_2d3d_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 4, 4).astype(np.float32))
    v, _ = fx.inv_2d_to_3d(x, split_factor=3)
    assert v.shape == (1, 3, 4, 4, 2)
    x2, _ = fx.inv_2d_to_3d(v, rev=True, split_factor=3)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x))


def test_householder_orthogonal():
    key = jax.random.PRNGKey(0)
    p = fx.init_householder_perm(key, 6, n_reflections=2)
    x = jnp.asarray(np.random.RandomState(4).randn(3, 6).astype(np.float32))
    y, _ = fx.householder_perm(p, x)
    x2, _ = fx.householder_perm(p, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # norm preserved
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=1),
                               np.linalg.norm(np.asarray(x), axis=1),
                               rtol=1e-4)


def test_orthogonal_transform_and_projection():
    key = jax.random.PRNGKey(1)
    p = fx.init_orthogonal_transform(key, 5)
    w = np.asarray(p["w"])
    np.testing.assert_allclose(w @ w.T, np.eye(5), atol=1e-5)
    p2 = fx.stiefel_project({"w": p["w"] + 0.01})
    w2 = np.asarray(p2["w"])
    np.testing.assert_allclose(w2 @ w2.T, np.eye(5), atol=1e-5)


def test_inv_auto_act_and_scaling():
    p = {"log_alpha": jnp.asarray(0.3)}
    x = jnp.asarray(np.linspace(-2, 2, 9).astype(np.float32).reshape(1, 9))
    y, jf = fx.inv_auto_act(p, x)
    x2, jr = fx.inv_auto_act(p, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jf), -np.asarray(jr), atol=1e-5)

    ps = fx.init_learned_elementwise_scaling((9,))
    ps = {"s": ps["s"] + 0.1}
    y, jf = fx.learned_elementwise_scaling(ps, x)
    x2, jr = fx.learned_elementwise_scaling(ps, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(float(jf[0]), 0.9, atol=1e-5)


def test_iresnet_inverse_and_logdet():
    w = 0.3 * np.asarray(jax.random.normal(jax.random.PRNGKey(2), (6, 6)))
    w = jnp.asarray(w / np.linalg.norm(w, 2) * 0.5)  # Lipschitz < 1

    def g(x):
        return jnp.tanh(x @ w)

    x = jnp.asarray(np.random.RandomState(5).randn(2, 6).astype(np.float32))
    y, ld = fx.iresnet_forward(g, x, n_series=20, key=jax.random.PRNGKey(3))
    x2 = fx.iresnet_inverse(g, y, n_iter=100)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # logdet estimate close to exact for a single sample
    jac = jax.jacobian(lambda u: u + g(u))(x[0])
    _, exact = np.linalg.slogdet(np.asarray(jac))
    assert abs(float(ld[0]) - exact) < 0.5  # single-probe Hutchinson is noisy


def test_gmm_nll_and_sample():
    key = jax.random.PRNGKey(4)
    mu = jnp.asarray([[0.0, 0.0], [5.0, 5.0]])
    ls = jnp.zeros((2, 2))
    lw = jnp.zeros((2,))
    z = jnp.asarray([[0.0, 0.0], [5.0, 5.0], [2.5, 2.5]])
    nll = np.asarray(fx.gmm_nll(z, mu, ls, lw))
    assert nll[0] < nll[2] and nll[1] < nll[2]
    s = fx.gmm_sample(key, 256, mu, ls, lw)
    assert s.shape == (256, 2)
    assert np.isfinite(np.asarray(s)).all()


def test_sequence_inn():
    rng = np.random.RandomState(6)
    m = rng.randn(4, 4).astype(np.float32) + 3 * np.eye(4, dtype=np.float32)
    p = fx.init_fixed_linear(m)
    seq = fx.SequenceINN()
    seq.append(fx.fixed_linear, p)
    seq.append(fx.inv_auto_act, {"log_alpha": jnp.asarray(0.2)})
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    y, jf = seq(x)
    x2, jr = seq(y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), -np.asarray(jr), atol=1e-4)


def test_deprecated_shims():
    import warnings
    import pytest
    from cwfa_tpu.flow import deprecated as fd

    rng = np.random.RandomState(7)
    m = rng.randn(4, 4).astype(np.float32) + 3 * np.eye(4, dtype=np.float32)
    p = fx.init_fixed_linear(m)
    x = jnp.asarray(rng.randn(2, 4).astype(np.float32))

    with pytest.warns(DeprecationWarning):
        seq = fd.ReversibleSequential((fx.fixed_linear, p))
    y_ref, j_ref = fx.SequenceINN((fx.fixed_linear, p))(x)
    y, j = seq(x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref))
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref))

    with pytest.warns(DeprecationWarning):
        net = fd.ReversibleGraphNet([(fx.fixed_linear, p)])
    with pytest.warns(DeprecationWarning):
        y2, j2 = net(x)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_ref))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        x2, jr = net(x=y2, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j2), -np.asarray(jr), atol=1e-4)
    # the removed graph-surgery arguments raise exactly as in the reference
    # (reversible_graph_net.py:15-24)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        with pytest.raises(ValueError):
            fd.ReversibleGraphNet([], ind_in=[0])
        with pytest.raises(ValueError):
            fd.ReversibleGraphNet([], ind_out=[0])


def test_inv_auto_act_two_sided():
    p = fx.init_inv_auto_act_two_sided(3, init_pos=2.0, init_neg=0.5)
    x = jnp.asarray(
        np.linspace(-2, 2, 24).astype(np.float32).reshape(2, 3, 2, 2))
    y, jf = fx.inv_auto_act_two_sided(p, x)
    # golden slopes: x>0 scaled by init_pos, x<0 by init_neg
    want = np.where(np.asarray(x) > 0, np.asarray(x) * 2.0,
                    np.asarray(x) * 0.5)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)
    x2, jr = fx.inv_auto_act_two_sided(p, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jf), -np.asarray(jr), atol=1e-5)
    # analytic logdet: sum of log-slopes over non-batch dims
    ls = np.where(np.asarray(x) > 0, np.log(2.0), np.log(0.5))
    ls = np.where(np.asarray(x) == 0, 0.5 * np.log(2.0 * 0.5), ls)
    np.testing.assert_allclose(np.asarray(jf), ls.reshape(2, -1).sum(1),
                               atol=1e-5)


def test_inv_auto_fc():
    key = jax.random.PRNGKey(0)
    p = fx.init_inv_auto_fc(key, 6)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 6).astype(np.float32))
    y, j = fx.inv_auto_fc(p, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(p["w"]).T
        + np.asarray(p["b"]), rtol=1e-4, atol=1e-5)
    assert float(jnp.abs(j).max()) == 0.0
    # with an exactly-orthogonal W the W^T reverse is a true inverse
    q, _ = np.linalg.qr(np.random.RandomState(2).randn(6, 6))
    po = {"w": jnp.asarray(q.astype(np.float32)), "b": p["b"]}
    y, _ = fx.inv_auto_fc(po, x)
    x2, _ = fx.inv_auto_fc(po, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)


def test_inv_auto_conv2d_matches_torch():
    import torch
    import torch.nn.functional as F
    key = jax.random.PRNGKey(3)
    p = fx.init_inv_auto_conv2d(key, 3, 5, kernel_size=3)
    x = np.random.RandomState(4).randn(2, 3, 8, 8).astype(np.float32)
    y, _ = fx.inv_auto_conv2d(p, jnp.asarray(x))
    wt = torch.from_numpy(np.asarray(p["w"]))
    bt = torch.from_numpy(np.asarray(p["b"]))
    want = F.conv2d(torch.from_numpy(x), wt, padding=1) \
        + bt.view(1, -1, 1, 1)
    np.testing.assert_allclose(np.asarray(y), want.numpy(),
                               rtol=1e-4, atol=1e-5)
    z = np.random.RandomState(5).randn(2, 5, 8, 8).astype(np.float32)
    xr, _ = fx.inv_auto_conv2d(p, jnp.asarray(z), rev=True)
    want_r = F.conv_transpose2d(torch.from_numpy(z) - bt.view(1, -1, 1, 1),
                                wt, padding=1)
    np.testing.assert_allclose(np.asarray(xr), want_r.numpy(),
                               rtol=1e-4, atol=1e-5)
