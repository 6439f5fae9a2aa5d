"""Haar transform unit tests: golden values, round trip, exact log-det.

Oracle equations from reference INN_utils.py:142-161 re-derived by hand:
fwd out[:, :h] = (x[:, ::2] + x[:, 1::2])/sqrt(2), etc.
"""

import numpy as np
import jax.numpy as jnp

from cwfa_tpu.flow import haar1d, haar2d_downsample, haar2d_upsample
from cwfa_tpu.flow.haar import haar1d_split, haar1d_merge
from cwfa_tpu.flow.core import numerical_logdet


def test_haar1d_golden():
    x = np.arange(8, dtype=np.float32).reshape(1, 4, 1, 2)
    y, ld = haar1d(jnp.asarray(x))
    s2 = np.sqrt(2.0)
    expect_avg = (x[:, 0::2] + x[:, 1::2]) / s2
    expect_diff = (x[:, 0::2] - x[:, 1::2]) / s2
    np.testing.assert_allclose(np.asarray(y[:, :2]), expect_avg, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(y[:, 2:]), expect_diff, rtol=1e-6)
    # orthonormal: logdet exactly 0
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-6)


def test_haar1d_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 5, 6).astype(np.float32)
    y, ld_f = haar1d(jnp.asarray(x))
    x2, ld_r = haar1d(y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_r), atol=1e-6)


def test_haar1d_numerical_logdet():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 3, 2).astype(np.float32)
    ld_num = numerical_logdet(lambda u: haar1d(u)[0][0], x)
    assert abs(ld_num) < 1e-2  # orthonormal


def test_haar1d_rebalance_logdet():
    # with rebalance != 1 the analytic logdet must match finite differences
    rng = np.random.RandomState(2)
    x = rng.randn(4, 2, 2).astype(np.float32)
    reb = 2.0
    _, ld = haar1d(jnp.asarray(x[None]), rebalance=reb)
    # analytic formula: ndims*(log16 + 4*log(0.5*reb))/4
    ndims = x.size
    expect = ndims * (np.log(16.0) + 4 * np.log(0.5 * reb)) / 4.0
    np.testing.assert_allclose(np.asarray(ld)[0], expect, rtol=1e-5)


def test_haar1d_split_merge():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 6, 4, 4).astype(np.float32)
    avg, diff, _ = haar1d_split(jnp.asarray(x))
    assert avg.shape == (1, 3, 4, 4) and diff.shape == (1, 3, 4, 4)
    x2, _ = haar1d_merge(avg, diff)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-5)


def test_haar2d_roundtrip():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    for obw in (False, True):
        y, ld_f = haar2d_downsample(jnp.asarray(x), order_by_wavelet=obw)
        assert y.shape == (2, 12, 4, 4)
        x2, ld_r = haar2d_downsample(y, rev=True, order_by_wavelet=obw)
        np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_r), atol=1e-5)


def test_haar2d_upsample_is_inverse_direction():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 4, 4).astype(np.float32)
    y, _ = haar2d_upsample(jnp.asarray(x))
    assert y.shape == (1, 1, 8, 8)
    x2, _ = haar2d_upsample(y, rev=True)
    np.testing.assert_allclose(np.asarray(x2), x, atol=1e-4)
