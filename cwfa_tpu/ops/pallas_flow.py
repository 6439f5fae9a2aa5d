"""Pallas TPU kernels for the flow hot path.

Two fused kernels cover the element-wise spine of every CWF step (the convs
stay in XLA, which tiles them onto the MXU):

- ``haar_merge_affine``: the inverse-direction fusion
      diff = (z - t) * exp(-clamp * f(s_raw))        [inverse CAT affine]
      out[:, 0::2] = (avg + diff) / sqrt(2)          [inverse Haar butterfly]
      out[:, 1::2] = (avg - diff) / sqrt(2)
  One VMEM pass instead of an XLA chain that materializes diff and the two
  butterfly halves in HBM (reference math: coupling_layers.py:475-500 +
  INN_utils.py:158-161).

- ``cat_affine``: standalone fused soft-clamped affine (fwd and rev) used
  between permutes where the Haar fusion doesn't apply.

Both kernels run in float32 internally regardless of the storage dtype and
fall back to stock jnp code (``*_reference``) under ``interpret=True`` for
CPU tests; the public entry points pick Pallas on TPU, jnp elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

_SQRT2_INV = 1.0 / math.sqrt(2.0)


def _clamp_f32(s_raw, clamp: float, activation: str):
    s = s_raw.astype(jnp.float32)
    if activation == "ATAN":
        return clamp * 0.636 * jnp.arctan(s)
    if activation == "TANH":
        return clamp * jnp.tanh(s)
    if activation == "SIGMOID":
        return clamp * 2.0 * (jax.nn.sigmoid(s) - 0.5)
    raise ValueError(activation)


# ---------------------------------------------------------------------------
# reference (jnp) implementations
# ---------------------------------------------------------------------------


def haar_merge_affine_reference(z, s_raw, t, avg, clamp=2.0,
                                activation="ATAN"):
    s = _clamp_f32(s_raw, clamp, activation)
    diff = ((z.astype(jnp.float32) - t.astype(jnp.float32))
            * jnp.exp(-s))
    a = avg.astype(jnp.float32)
    even = (a + diff) * _SQRT2_INV
    odd = (a - diff) * _SQRT2_INV
    b, h = avg.shape[0], avg.shape[1]
    out = jnp.stack([even, odd], axis=2).reshape(
        (b, 2 * h) + avg.shape[2:])
    return out.astype(avg.dtype)


def cat_affine_reference(x, s_raw, t, rev=False, clamp=2.0,
                         activation="ATAN"):
    s = _clamp_f32(s_raw, clamp, activation)
    xf = x.astype(jnp.float32)
    if rev:
        y = (xf - t.astype(jnp.float32)) * jnp.exp(-s)
    else:
        y = jnp.exp(s) * xf + t.astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------


def _haar_merge_affine_kernel(z_ref, s_ref, t_ref, avg_ref, out_ref, *,
                              clamp, activation):
    s = _clamp_f32(s_ref[...], clamp, activation)
    diff = (z_ref[...].astype(jnp.float32)
            - t_ref[...].astype(jnp.float32)) * jnp.exp(-s)
    a = avg_ref[...].astype(jnp.float32)
    even = ((a + diff) * _SQRT2_INV).astype(out_ref.dtype)
    odd = ((a - diff) * _SQRT2_INV).astype(out_ref.dtype)
    c = even.shape[1]
    inter = jnp.stack([even, odd], axis=2).reshape(
        (even.shape[0], 2 * c) + even.shape[2:])
    out_ref[...] = inter


def _cat_affine_kernel(x_ref, s_ref, t_ref, out_ref, *, clamp, activation,
                       rev):
    s = _clamp_f32(s_ref[...], clamp, activation)
    xf = x_ref[...].astype(jnp.float32)
    if rev:
        y = (xf - t_ref[...].astype(jnp.float32)) * jnp.exp(-s)
    else:
        y = jnp.exp(s) * xf + t_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


def _row_tile(h: int) -> int:
    for t in (64, 32, 16, 8, 4, 2, 1):
        if h % t == 0:
            return t
    return 1


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("clamp", "activation",
                                             "interpret"))
def haar_merge_affine(z, s_raw, t, avg, clamp: float = 2.0,
                      activation: str = "ATAN", interpret: bool = False):
    """Fused inverse CAT affine + inverse depth-Haar.

    z, s_raw, t, avg: (B, C, H, W) -> out (B, 2C, H, W)."""
    if not interpret and not _on_tpu():
        return haar_merge_affine_reference(z, s_raw, t, avg, clamp, activation)
    b, c, h, w = z.shape
    th = _row_tile(h)
    grid = (b, h // th)
    spec = pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0))
    out_spec = pl.BlockSpec((1, 2 * c, th, w), lambda i, j: (i, 0, j, 0))
    return pl.pallas_call(
        functools.partial(_haar_merge_affine_kernel, clamp=clamp,
                          activation=activation),
        out_shape=jax.ShapeDtypeStruct((b, 2 * c, h, w), avg.dtype),
        grid=grid, in_specs=[spec] * 4, out_specs=out_spec,
        interpret=interpret,
    )(z, s_raw, t, avg)


@functools.partial(jax.jit, static_argnames=("rev", "clamp", "activation",
                                             "interpret"))
def cat_affine(x, s_raw, t, rev: bool = False, clamp: float = 2.0,
               activation: str = "ATAN", interpret: bool = False):
    """Fused soft-clamped conditional affine (no logdet — inference path)."""
    if not interpret and not _on_tpu():
        return cat_affine_reference(x, s_raw, t, rev, clamp, activation)
    b, c, h, w = x.shape
    th = _row_tile(h)
    grid = (b, h // th)
    spec = pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0))
    return pl.pallas_call(
        functools.partial(_cat_affine_kernel, clamp=clamp,
                          activation=activation, rev=rev),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid, in_specs=[spec] * 3, out_specs=spec,
        interpret=interpret,
    )(x, s_raw, t)
