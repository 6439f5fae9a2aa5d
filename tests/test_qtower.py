"""Fused int8 pair-tower kernel: oracle equivalence + quantization accuracy.

The integer path (int8 convs accumulated in int32) is exact regardless of
summation order, so the Pallas kernel (interpret mode on CPU) must agree
with the jnp/XLA oracle to float-epilogue precision.  A second test bounds
the quantization error against the f32 tower.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu.flow.subnets import init_wavelet_flow_subnet2d
from cwfa_tpu.models.cwf import pair_tower_params, _paired_tower
from cwfa_tpu.ops import qtower

B, CIN, H, W, NCH, NOUT1 = 2, 6, 16, 16, 8, 12  # single-tower sizes


@pytest.fixture(scope="module")
def setup():
    k = jax.random.PRNGKey(0)
    ka, kb, kx = jax.random.split(k, 3)
    pa = init_wavelet_flow_subnet2d(ka, CIN, NOUT1, n_ch=NCH)
    pb = init_wavelet_flow_subnet2d(kb, CIN, NOUT1, n_ch=NCH)
    paired = pair_tower_params(pa, pb)
    x = jax.random.normal(kx, (B, CIN, H, W), jnp.float32)
    scales = qtower.pair_tower_calibrate(paired, x)
    qw = qtower.quantize_pair_tower(paired, scales)
    return pa, pb, paired, x, scales, qw


def _qin_nchw(x, scales):
    # multiply by the precomputed reciprocal, matching quantize_input and
    # the kernel exactly (division can differ by 1 ulp at round() boundaries)
    inv = (1.0 / scales[0, :x.shape[1]]).astype(jnp.float32)
    return jnp.clip(jnp.round(x * inv[None, :, None, None]),
                    -127, 127).astype(jnp.int8)


def test_kernel_matches_oracle(setup):
    pa, pb, paired, x, scales, qw = setup
    ref = np.asarray(qtower.quantized_pair_tower_reference(
        qw, scales, _qin_nchw(x, scales)))

    xq = qtower.quantize_input(x, scales[0])
    out = qtower.fused_pair_tower(xq, qw, scales, h=H, w=W, th=4,
                                  out_dtype=jnp.float32, interpret=True)
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=2e-4, atol=2e-4)


def test_quantization_accuracy_vs_f32(setup):
    pa, pb, paired, x, scales, qw = setup
    oa, ob = _paired_tower(pa, pb, x)
    f32 = np.concatenate([np.asarray(oa), np.asarray(ob)], axis=1)

    qout = np.asarray(qtower.quantized_pair_tower_reference(
        qw, scales, _qin_nchw(x, scales)))
    rel = (np.linalg.norm(qout - f32)
           / max(np.linalg.norm(f32), 1e-9))
    assert rel < 0.06, f"relative RMS error {rel:.4f}"


def test_zero_padding_semantics(setup):
    """Border pixels: oracle uses SAME zero padding; the kernel's shrinking
    canvas + border re-zeroing must reproduce it exactly (covered by the
    oracle match) — and the output must differ from a wrap/garbage pad:
    perturbing x outside the image (impossible) aside, check a translated
    input does NOT produce translated output at the border."""
    pa, pb, paired, x, scales, qw = setup
    xq = qtower.quantize_input(x, scales[0])
    out = qtower.fused_pair_tower(xq, qw, scales, h=H, w=W, th=4,
                                  out_dtype=jnp.float32, interpret=True)
    # tile boundary consistency: th=8 (2 tiles) == th=4 (4 tiles), and
    # column tiling tw=8 (2 col tiles) == tw=16 (1 col tile)
    out2 = qtower.fused_pair_tower(xq, qw, scales, h=H, w=W, th=8,
                                   out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)
    out3 = qtower.fused_pair_tower(xq, qw, scales, h=H, w=W, th=4, tw=8,
                                   out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3),
                               rtol=1e-5, atol=1e-5)
