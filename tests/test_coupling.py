"""Coupling-block unit tests: golden CAT math, round trips, log-det parity
with finite differences (the F1 contract from FrEIA/modules/base.py:17-31)."""

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.flow import (
    cat_transform, two_sided_coupling, one_sided_coupling,
    all_in_one_block, init_all_in_one_block, clamp_fn,
)
from cwfa_tpu.flow.core import numerical_logdet
from cwfa_tpu.flow.subnets import (
    init_wavelet_flow_subnet2d, wavelet_flow_subnet2d,
    init_wavelet_flow_subnet2d_first, wavelet_flow_subnet2d_first,
)


def _linear_subnet(scale, bias):
    """Deterministic toy subnet: f(c) = scale*c + bias, channel-doubling."""
    def apply(params, c):
        return jnp.concatenate([scale * c, bias + 0.0 * c], axis=1)
    return apply, None


def test_cat_golden():
    # y = exp(clamp*0.636*atan(s_raw)) * x + t with s_raw, t from cond only
    x = jnp.asarray(np.array([[[[1.0, 2.0]], [[3.0, -1.0]]]], np.float32))
    cond = jnp.asarray(np.array([[[[0.5, -0.25]], [[0.1, 0.0]]]], np.float32))
    apply, p = _linear_subnet(2.0, 0.3)
    y, j = cat_transform(apply, p, x, (cond,), clamp=2.0,
                         clamp_activation="ATAN")
    s = 2.0 * 0.636 * np.arctan(2.0 * np.asarray(cond))
    expect = np.exp(s) * np.asarray(x) + 0.3
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j), s.sum(), rtol=1e-5)
    # inverse
    x2, j2 = cat_transform(apply, p, y, (cond,), rev=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j2), -s.sum(), rtol=1e-5)


def test_clamps():
    u = jnp.asarray(np.linspace(-20, 20, 7, dtype=np.float32))
    atan = np.asarray(clamp_fn("ATAN")(u))
    assert np.all(np.abs(atan) <= 1.0)
    np.testing.assert_allclose(np.asarray(clamp_fn("TANH")(u)), np.tanh(u),
                               rtol=1e-6)
    sig = np.asarray(clamp_fn("SIGMOID")(u))
    assert np.all(np.abs(sig) <= 1.0)


def _real_subnet(key, c_in, c_out):
    p = init_wavelet_flow_subnet2d(key, c_in, c_out, n_ch=8)
    return (wavelet_flow_subnet2d, p)


def test_two_sided_roundtrip_and_logdet():
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    x_np = rng.randn(1, 4, 3, 3).astype(np.float32)
    cond = jnp.asarray(rng.randn(1, 2, 3, 3).astype(np.float32))
    x = jnp.asarray(x_np)
    for kind in ["NICE", "RNVP", "GLOW", "GIN"]:
        ks = jax.random.split(key, 4)
        if kind == "NICE":
            subnets = {"F": _real_subnet(ks[0], 2 + 2, 2),
                       "G": _real_subnet(ks[1], 2 + 2, 2)}
        elif kind == "RNVP":
            subnets = {"s1": _real_subnet(ks[0], 4, 2),
                       "t1": _real_subnet(ks[1], 4, 2),
                       "s2": _real_subnet(ks[2], 4, 2),
                       "t2": _real_subnet(ks[3], 4, 2)}
        else:
            subnets = {"subnet1": _real_subnet(ks[0], 4, 4),
                       "subnet2": _real_subnet(ks[1], 4, 4)}
        y, jf = two_sided_coupling(kind, subnets, x, (cond,))
        x2, jr = two_sided_coupling(kind, subnets, y, (cond,), rev=True)
        np.testing.assert_allclose(np.asarray(x2), x_np, atol=1e-4,
                                   err_msg=kind)
        np.testing.assert_allclose(np.asarray(jf), -np.asarray(jr), atol=1e-4)
        if kind == "GIN":
            np.testing.assert_allclose(np.asarray(jf), 0.0, atol=1e-5)
        # numerical logdet vs analytic
        ld_num = numerical_logdet(
            lambda u: two_sided_coupling(kind, subnets, u, (cond,))[0][0],
            x_np[0])
        np.testing.assert_allclose(ld_num, float(jf[0]), atol=5e-2,
                                   err_msg=kind)


def test_one_sided_roundtrip():
    key = jax.random.PRNGKey(1)
    rng = np.random.RandomState(1)
    x_np = rng.randn(1, 5, 3, 3).astype(np.float32)  # odd channels: 2|3 split
    x = jnp.asarray(x_np)
    subnet = _real_subnet(key, 2, 6)
    y, jf = one_sided_coupling(subnet, x)
    x2, jr = one_sided_coupling(subnet, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), x_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), -np.asarray(jr), atol=1e-5)


def test_all_in_one_roundtrip_and_logdet():
    key = jax.random.PRNGKey(2)
    rng = np.random.RandomState(2)
    x_np = rng.randn(1, 4, 3, 3).astype(np.float32)
    x = jnp.asarray(x_np)
    aio = init_all_in_one_block(key, 4, rng=np.random.RandomState(7))
    subnet = _real_subnet(jax.random.PRNGKey(3), 2, 4)
    y, jf = all_in_one_block(aio, subnet, x)
    x2, jr = all_in_one_block(aio, subnet, y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), x_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jf), -np.asarray(jr), atol=1e-4)
    ld_num = numerical_logdet(
        lambda u: all_in_one_block(aio, subnet, u)[0][0], x_np[0])
    np.testing.assert_allclose(ld_num, float(jf[0]), atol=5e-2)


def test_first_subnet_prior_injection():
    """The _first subnet must emit t = -low_res/sqrt(2) as its second half
    (reference networks.py:656-671)."""
    key = jax.random.PRNGKey(4)
    p = init_wavelet_flow_subnet2d_first(key, 4, 4, n_ch=8)
    rng = np.random.RandomState(3)
    low = rng.randn(1, 2, 3, 3).astype(np.float32)
    cond = rng.randn(1, 2, 3, 3).astype(np.float32)
    out = wavelet_flow_subnet2d_first(
        p, jnp.concatenate([jnp.asarray(low), jnp.asarray(cond)], axis=1))
    np.testing.assert_allclose(np.asarray(out[:, 2:]), -low / np.sqrt(2.0),
                               rtol=1e-5)
