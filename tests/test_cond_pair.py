"""Fused cond-pair Pallas kernel (ops/cond_pair.py) vs the depthbatch
oracle (models/cond_net._conv3d_pair_depthbatch) — the round-4
build-and-measure answer to VERDICT item 1.

Reference semantics: networks.py:221-239 (Conv3d(1->32) -> PReLU ->
Conv3d(32->1) over a depth-as-last-axis layout)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu import nn as cnn
from cwfa_tpu.models.cond_net import (_conv3d_pair_depthbatch,
                                      init_cond_network)
from cwfa_tpu.ops import cond_pair


def _pair_params(key, d):
    p = init_cond_network(key, 3, d)
    return {"c3a": p["c3a"], "c3b": p["c3b"], "prelu": p["prelu"]}


@pytest.mark.parametrize("d,h,w,th", [(8, 16, 16, 8), (12, 24, 20, 8),
                                      (4, 8, 12, 4)])
def test_cond_pair_fused_matches_depthbatch(d, h, w, th):
    key = jax.random.PRNGKey(d)
    p = _pair_params(key, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, d, h, w), jnp.float32)

    act = lambda u: cnn.prelu(p["prelu"], u)
    want = np.asarray(_conv3d_pair_depthbatch(p, x, act, 0.0, None))
    got = np.asarray(cond_pair.cond_pair_fused(x, p, th=th,
                                               interpret=True))
    assert got.shape == want.shape
    # the kernel's dots are bf16 (matching the shipped bf16 inference
    # path); tolerance sized to bf16 mantissa on the accumulated sums
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-2 * scale, rtol=5e-2)


def test_cond_pair_weights_roundtrip_exact_on_delta():
    """Golden check with delta weights: conv_a tap (dh,dw,dc) = identity
    shift, conv_b likewise — the pair reduces to a pure double shift whose
    output the packing must reproduce exactly (no rounding: weights 1)."""
    d, h, w = 8, 16, 16
    k = 32
    wa = np.zeros((k, 1, 3, 3, 3), np.float32)
    wb = np.zeros((1, k, 3, 3, 3), np.float32)
    wa[0, 0, 2, 1, 1] = 1.0      # shift down in H
    wb[0, 0, 0, 1, 1] = 1.0      # shift back up
    p = {"c3a": {"w": jnp.asarray(wa), "b": jnp.zeros((k,))},
         "c3b": {"w": jnp.asarray(wb), "b": jnp.zeros((1,))},
         "prelu": {"alpha": jnp.asarray(1.0)}}   # linear activation
    x = jax.random.normal(jax.random.PRNGKey(0), (1, d, h, w), jnp.float32)
    x = jnp.round(x * 8) / 8     # bf16-exact values
    got = np.asarray(cond_pair.cond_pair_fused(x, p, th=8, interpret=True))
    want = np.asarray(x)
    # double shift: rows 1..h-1 see x shifted down then up = identity on
    # the interior; SAME padding zeroes the seam rows
    want2 = np.zeros_like(want)
    want2[:, :, 1:, :] = want[:, :, 1:, :]
    np.testing.assert_allclose(got, want2, atol=1e-6)


def test_cond_pair_fused_slab_path():
    """Depths beyond the 16-chunk lane capacity run in overlapping slabs
    whose outputs must concatenate exactly (exercised with a reduced
    max_chunks so the test stays small)."""
    d, h, w = 24, 16, 16     # 6 chunks; max_chunks=4 forces 2 slabs
    key = jax.random.PRNGKey(7)
    p = _pair_params(key, d)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, d, h, w), jnp.float32)
    act = lambda u: cnn.prelu(p["prelu"], u)
    want = np.asarray(_conv3d_pair_depthbatch(p, x, act, 0.0, None))
    got = np.asarray(cond_pair.cond_pair_fused(x, p, th=8, interpret=True,
                                               max_chunks=4))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-2 * scale, rtol=5e-2)
    # and against the single-slab kernel result (same kernel numerics ->
    # tight tolerance: slabbing must be numerically invisible)
    one = np.asarray(cond_pair.cond_pair_fused(x, p, th=8, interpret=True))
    np.testing.assert_allclose(got, one, atol=1e-6)


def test_cond_network_pallas_fused_impl():
    """The full cond_network with conv3d_impl='pallas_fused' matches the
    shipped depthbatch path (inference mode), and the dropout/training
    combination is rejected."""
    from cwfa_tpu.models.cond_net import cond_network

    d = 8
    key = jax.random.PRNGKey(3)
    from cwfa_tpu.models.cond_net import init_cond_network
    p = init_cond_network(key, 4, d)
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16, 16),
                          jnp.float32)
    want = np.asarray(cond_network(p, x, conv3d_impl="depthbatch"))
    got = np.asarray(cond_network(p, x, conv3d_impl="pallas_fused"))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=3e-2 * scale, rtol=5e-2)
    with pytest.raises(ValueError, match="inference-only"):
        cond_network(p, x, train=True, rng=jax.random.PRNGKey(5),
                     conv3d_impl="pallas_fused")
