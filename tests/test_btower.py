"""Streaming bf16 Pallas paired-tower kernel (ops/btower) vs its cast-exact
jnp oracle and the f32 XLA tower (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu.flow import subnets as fs
from cwfa_tpu.models.cwf import pair_tower_params, _paired_tower
from cwfa_tpu.ops import btower

B, H, W, CIN, NCH = 2, 32, 32, 12, 16


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    ka, kb, kx = jax.random.split(key, 3)
    pa = fs.init_wavelet_flow_subnet2d(ka, CIN, 2 * CIN, n_ch=NCH)
    pb = fs.init_wavelet_flow_subnet2d(kb, CIN, 2 * CIN, n_ch=NCH)
    paired = pair_tower_params(pa, pb)
    x = jax.random.normal(kx, (B, CIN, H, W), jnp.float32)
    return pa, pb, paired, x


@pytest.mark.parametrize("th,tw,taps", [(8, 16, "dots"), (8, 32, "patch"),
                                        (4, 16, "dots")])
def test_kernel_matches_oracle(setup, th, tw, taps):
    _, _, paired, x = setup
    ref = np.asarray(btower.pair_tower_bf16_reference(paired, x))
    wp = btower.pack_pair_tower_bf16(paired)
    xp = btower.prep_input_bf16(x)
    out = btower.fused_pair_tower_bf16(xp, wp, h=H, w=W, th=th, tw=tw,
                                       out_dtype=jnp.float32,
                                       interpret=True, taps_mode=taps)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    # identical cast structure; residual error is f32 accumulation ORDER
    # in the tap dots vs the oracle's convolution
    np.testing.assert_allclose(out_nchw, ref, atol=2e-3, rtol=2e-2)


def test_bf16_path_tracks_f32_tower(setup):
    pa, pb, paired, x = setup
    oa, ob = _paired_tower(pa, pb, x)
    f32 = np.concatenate([np.asarray(oa), np.asarray(ob)], axis=1)
    wp = btower.pack_pair_tower_bf16(paired)
    xp = btower.prep_input_bf16(x)
    out = btower.fused_pair_tower_bf16(xp, wp, h=H, w=W, th=8, tw=16,
                                       out_dtype=jnp.float32, interpret=True)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    rel = np.linalg.norm(out_nchw - f32) / max(np.linalg.norm(f32), 1e-9)
    assert rel < 0.02, rel          # bf16 canvas rounding only


def test_edge_rows_and_cols_exact_zero_padding(setup):
    """The streaming carries + masks must reproduce per-conv zero padding at
    the image border exactly (not just in the interior)."""
    _, _, paired, x = setup
    ref = np.asarray(btower.pair_tower_bf16_reference(paired, x))
    wp = btower.pack_pair_tower_bf16(paired)
    xp = btower.prep_input_bf16(x)
    out = btower.fused_pair_tower_bf16(xp, wp, h=H, w=W, th=8, tw=16,
                                       out_dtype=jnp.float32, interpret=True)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    for sl in (np.s_[..., :5, :], np.s_[..., -5:, :],
               np.s_[..., :, :5], np.s_[..., :, -5:]):
        np.testing.assert_allclose(out_nchw[sl], ref[sl], atol=2e-3,
                                   rtol=2e-2)
