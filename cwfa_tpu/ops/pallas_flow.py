"""Pallas TPU kernels for the flow hot path.

Two fused kernels cover the element-wise spine of every CWF step (the convs
stay in XLA, which tiles them onto the MXU):

- ``haar_merge_affine``: the inverse-direction fusion
      diff = (z - t) * exp(-s)                       [inverse CAT affine]
      out[:, 0::2] = (avg + diff) / sqrt(2)          [inverse Haar butterfly]
      out[:, 1::2] = (avg - diff) / sqrt(2)
  One VMEM pass instead of an XLA chain that materializes diff and the two
  butterfly halves in HBM (reference math: coupling_layers.py:475-500 +
  INN_utils.py:158-161).

- ``cat_affine``: fused exp+affine (fwd and rev) used between permutes where
  the Haar fusion doesn't apply.

The soft clamp s = clamp * f(s_raw) runs OUTSIDE the kernels (XLA fuses it
into the subnet's last conv; Pallas TPU has no ``atan`` lowering).  Kernels
compute in float32 internally regardless of storage dtype and fall back to
stock jnp code under ``interpret=True`` / non-TPU backends.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

_SQRT2_INV = 1.0 / math.sqrt(2.0)


def clamp_s(s_raw, clamp: float = 2.0, activation: str = "ATAN"):
    """Soft clamp (reference coupling_layers.py:50-60), fp32.

    Thin fp32 wrapper over the single clamp table in flow/coupling.clamp_fn
    — the fast (pallas) and slow (coupling) inference paths must never
    desynchronize on this mapping."""
    from cwfa_tpu.flow.coupling import clamp_fn
    return clamp * clamp_fn(activation)(s_raw.astype(jnp.float32))


# ---------------------------------------------------------------------------
# reference (jnp) implementations — s is already clamped
# ---------------------------------------------------------------------------


def haar_merge_affine_reference(z, s, t, avg):
    diff = ((z.astype(jnp.float32) - t.astype(jnp.float32))
            * jnp.exp(-s.astype(jnp.float32)))
    a = avg.astype(jnp.float32)
    even = (a + diff) * _SQRT2_INV
    odd = (a - diff) * _SQRT2_INV
    b, h = avg.shape[0], avg.shape[1]
    out = jnp.stack([even, odd], axis=2).reshape(
        (b, 2 * h) + avg.shape[2:])
    return out.astype(avg.dtype)


def cat_affine_reference(x, s, t, rev=False):
    xf = x.astype(jnp.float32)
    sf = s.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    y = (xf - tf) * jnp.exp(-sf) if rev else jnp.exp(sf) * xf + tf
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------


def _haar_merge_affine_kernel(z_ref, s_ref, t_ref, avg_ref, out_ref):
    diff = (z_ref[...].astype(jnp.float32)
            - t_ref[...].astype(jnp.float32)) * jnp.exp(
                -s_ref[...].astype(jnp.float32))
    a = avg_ref[...].astype(jnp.float32)
    even = ((a + diff) * _SQRT2_INV).astype(out_ref.dtype)
    odd = ((a - diff) * _SQRT2_INV).astype(out_ref.dtype)
    c = even.shape[1]
    inter = jnp.stack([even, odd], axis=2).reshape(
        (even.shape[0], 2 * c) + even.shape[2:])
    out_ref[...] = inter


def _cat_affine_kernel(x_ref, s_ref, t_ref, out_ref, *, rev):
    xf = x_ref[...].astype(jnp.float32)
    sf = s_ref[...].astype(jnp.float32)
    tf = t_ref[...].astype(jnp.float32)
    y = (xf - tf) * jnp.exp(-sf) if rev else jnp.exp(sf) * xf + tf
    out_ref[...] = y.astype(out_ref.dtype)


def _row_tile(h: int, c: int, w: int, itemsize: int, n_buffers: int,
              vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest row tile whose double-buffered working set fits the VMEM
    budget (~half of the 16 MB scoped limit)."""
    per_row = c * w * itemsize * n_buffers * 2   # x2: pipeline double buffer
    cap = max(vmem_budget // max(per_row, 1), 1)
    for t in (64, 32, 16, 8, 4, 2, 1):
        if t <= cap and h % t == 0:
            return t
    return 1


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def haar_merge_affine(z, s, t, avg, interpret: bool = False):
    """Fused inverse CAT affine + inverse depth-Haar; s pre-clamped.

    z, s, t, avg: (B, C, H, W) -> out (B, 2C, H, W)."""
    if not interpret and not _on_tpu():
        return haar_merge_affine_reference(z, s, t, avg)
    b, c, h, w = z.shape
    th = _row_tile(h, c, w, z.dtype.itemsize, n_buffers=6)  # 4 in + 2C out
    grid = (b, h // th)
    spec = pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0))
    out_spec = pl.BlockSpec((1, 2 * c, th, w), lambda i, j: (i, 0, j, 0))
    return pl.pallas_call(
        _haar_merge_affine_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 2 * c, h, w), avg.dtype),
        grid=grid, in_specs=[spec] * 4, out_specs=out_spec,
        interpret=interpret,
    )(z, s, t, avg)


@functools.partial(jax.jit, static_argnames=("rev", "interpret"))
def cat_affine(x, s, t, rev: bool = False, interpret: bool = False):
    """Fused conditional affine (no logdet — inference path); s pre-clamped."""
    if not interpret and not _on_tpu():
        return cat_affine_reference(x, s, t, rev)
    b, c, h, w = x.shape
    th = _row_tile(h, c, w, x.dtype.itemsize, n_buffers=4)  # 3 in + 1 out
    grid = (b, h // th)
    spec = pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0))
    return pl.pallas_call(
        functools.partial(_cat_affine_kernel, rev=rev),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid, in_specs=[spec] * 3, out_specs=spec,
        interpret=interpret,
    )(x, s, t)
