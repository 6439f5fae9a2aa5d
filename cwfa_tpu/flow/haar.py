"""Haar wavelet transforms with exact log-det Jacobians.

``haar1d`` is the core op of every CWF step: an orthonormal 1-D Haar butterfly
along the depth (channel) axis — averages land in the first half of the
channels, differences in the second half; spatial resolution is untouched.
Behavioral contract matches reference INN_utils.py:126-174 (HaarTransform1D):

    fwd:  out[:, :h] = (x[:, ::2] + x[:, 1::2]) / sqrt(2)
          out[:, h:] = (x[:, ::2] - x[:, 1::2]) / sqrt(2)
    rev:  out[:, ::2] = (x[:, :h] + x[:, h:]) / sqrt(2)
          out[:, 1::2] = (x[:, :h] - x[:, h:]) / sqrt(2)

log-det: the reference parameterizes it as ndims*(log16 + 4*log(fac))/4 with
fac = 0.5*rebalance (INN_utils.py:135-140); for the default rebalance=1 the
transform is orthonormal and the log-det is exactly 0.  We keep the general
formula for flag parity.

``haar2d_downsample``/``haar2d_upsample`` provide the 2-D spatial Haar of
FrEIA (reference FrEIA/modules/reshapes.py:196-318) for completeness — the
main CWFA path does not use them (networks.py:313-316 keeps them commented
out) but the block type is selectable in the reference library.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2_INV = 1.0 / math.sqrt(2.0)


def _haar1d_logdet_coeff(rebalance: float, rev: bool) -> float:
    """Per-element log-det coefficient (reference INN_utils.py:138-140)."""
    fac = 0.5 * rebalance if not rev else 0.5 / rebalance
    return (math.log(16.0) + 4.0 * math.log(fac)) / 4.0


def haar1d(x: jax.Array, rev: bool = False, rebalance: float = 1.0):
    """1-D Haar along axis 1 of an (B, D, H, W) array. D must be even.

    Returns (y, logdet) where logdet has shape (B,) in float32.

    Parity note (INN_utils.py:135-160): the reference hardcodes the VALUE
    scaling to 1/sqrt(2) while computing the log-det from the
    rebalance-dependent ``fac`` — for ``rebalance != 1`` the reported
    log-det does not match the actual (still orthonormal) transform and
    the fwd/rev log-dets are not negatives of each other.  Replayed here
    bit-for-bit; dormant in practice, CWFA always builds the transform
    with rebalance=1 (networks.py:308-311) where logdet is exactly 0.
    """
    d = x.shape[1]
    h = d // 2
    if not rev:
        even, odd = x[:, 0::2], x[:, 1::2]
        avg = (even + odd) * jnp.asarray(_SQRT2_INV, x.dtype)
        diff = (even - odd) * jnp.asarray(_SQRT2_INV, x.dtype)
        y = jnp.concatenate([avg, diff], axis=1)
        coeff = _haar1d_logdet_coeff(rebalance, rev=False)
        ndims = float(np.prod(x.shape[1:]))
        logdet = jnp.full((x.shape[0],), ndims * coeff, jnp.float32)
    else:
        a, dcoef = x[:, :h], x[:, h:]
        even = (a + dcoef) * jnp.asarray(_SQRT2_INV, x.dtype)
        odd = (a - dcoef) * jnp.asarray(_SQRT2_INV, x.dtype)
        # interleave: y[:, ::2] = even ; y[:, 1::2] = odd
        y = jnp.stack([even, odd], axis=2).reshape(x.shape)
        coeff = _haar1d_logdet_coeff(rebalance, rev=True)
        ndims = float(np.prod(x.shape[1:]))
        logdet = jnp.full((x.shape[0],), -ndims * coeff, jnp.float32)
    return y, logdet


def haar1d_split(x: jax.Array, rebalance: float = 1.0):
    """Fused forward Haar + 50/50 channel split (reference composes
    HaarTransform1D with Fm.Split at networks.py:308-324). Returns
    (averages, differences, logdet)."""
    y, logdet = haar1d(x, rev=False, rebalance=rebalance)
    h = x.shape[1] // 2
    return y[:, :h], y[:, h:], logdet


def haar1d_merge(avg: jax.Array, diff: jax.Array, rebalance: float = 1.0):
    """Inverse of haar1d_split: concat + inverse Haar. Returns (x, logdet)."""
    return haar1d(jnp.concatenate([avg, diff], axis=1), rev=True,
                  rebalance=rebalance)


# ---------------------------------------------------------------------------
# 2-D spatial Haar (FrEIA HaarDownsampling parity)
# ---------------------------------------------------------------------------

# Order of the four 2-D Haar filters: LL, LH, HL, HH applied per input channel.
_HAAR2D = np.array(
    [[[1, 1], [1, 1]],
     [[1, -1], [1, -1]],
     [[1, 1], [-1, -1]],
     [[1, -1], [-1, 1]]], dtype=np.float32)


def _haar2d_perm(c_in: int, order_by_wavelet: bool) -> np.ndarray:
    """Channel order of the 4*c_in outputs (reference reshapes.py:256-271):
    grouped-by-input-channel -> grouped-by-wavelet when order_by_wavelet."""
    if not order_by_wavelet:
        return np.arange(4 * c_in)
    # output index o = 4*ic + w  ->  position w*c_in + ic
    perm = np.zeros(4 * c_in, dtype=np.int64)
    for ic in range(c_in):
        for w in range(4):
            perm[w * c_in + ic] = 4 * ic + w
    return perm


def haar2d_downsample(x: jax.Array, rev: bool = False,
                      order_by_wavelet: bool = False, rebalance: float = 1.0):
    """2-D Haar: (B, C, H, W) <-> (B, 4C, H/2, W/2) with exact log-det
    (reference FrEIA/modules/reshapes.py:196-318)."""
    fac_fwd = 0.5 * rebalance
    fac_rev = 0.5 / rebalance
    jac_fwd = (math.log(16.0) + 4 * math.log(fac_fwd)) / 4.0
    jac_rev = (math.log(16.0) + 4 * math.log(fac_rev)) / 4.0
    if not rev:
        b, c, hh, ww = x.shape
        ndims = float(c * hh * ww)
        # depthwise stride-2 conv with the 4 Haar filters
        w = jnp.asarray(np.tile(_HAAR2D[:, None], (c, 1, 1, 1)), x.dtype)  # (4C,1,2,2)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST) * jnp.asarray(fac_fwd, x.dtype)
        perm = _haar2d_perm(c, order_by_wavelet)
        y = y[:, perm]
        logdet = jnp.full((x.shape[0],), ndims * jac_fwd, jnp.float32)
        return y, logdet
    else:
        b, c4, hh, ww = x.shape
        c = c4 // 4
        ndims = float(c4 * hh * ww)
        perm = _haar2d_perm(c, order_by_wavelet)
        inv = np.argsort(perm)
        xp = x[:, inv]
        y = _haar2d_inverse(xp, c, fac_rev, x.dtype)
        logdet = jnp.full((x.shape[0],), -ndims * jac_rev, jnp.float32)
        return y, logdet


def _haar2d_inverse(xp: jax.Array, c: int, fac_rev: float, dtype):
    """Inverse 2-D Haar via the transposed depthwise conv (exact inverse of
    the forward with fac_fwd = 1/(4*fac_rev) scaling identity)."""
    b, c4, hh, ww = xp.shape
    coef = xp.reshape(b, c, 4, hh, ww)
    ll, lh, hl, hh_ = coef[:, :, 0], coef[:, :, 1], coef[:, :, 2], coef[:, :, 3]
    tl = ll + lh + hl + hh_
    tr = ll - lh + hl - hh_
    bl = ll + lh - hl - hh_
    br = ll - lh - hl + hh_
    top = jnp.stack([tl, tr], axis=-1).reshape(b, c, hh, 2 * ww)
    bot = jnp.stack([bl, br], axis=-1).reshape(b, c, hh, 2 * ww)
    y = jnp.stack([top, bot], axis=3).reshape(b, c, 2 * hh, 2 * ww)
    return y * jnp.asarray(fac_rev, dtype)


def haar2d_upsample(x: jax.Array, rev: bool = False,
                    order_by_wavelet: bool = False, rebalance: float = 1.0):
    """FrEIA HaarUpsampling == HaarDownsampling with rev flipped."""
    return haar2d_downsample(x, rev=not rev, order_by_wavelet=order_by_wavelet,
                             rebalance=rebalance)
