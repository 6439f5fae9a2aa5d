"""Pallas TPU fused residual-block convolution for the wavelet-flow towers.

The dominant compute of every CWF step is the subnet residual tower
(flow/subnets.py): three blocks of [3x3 conv -> ELU -> 1x1 conv] + residual.
XLA runs the 64/128-channel 3x3 convs at ~22-66 TFLOP/s on v5e; this kernel
executes one whole residual block as GEMMs on the MXU with all intermediates
resident in VMEM:

    acc  = sum_{dh,dw} x[h+dh, w+dw, :] @ W3[dh, dw]      (9 MXU matmuls)
    y    = ELU(acc + b3)
    out  = y @ W1 + b1 + x                                 (1 MXU matmul)

Layout: NHWC with C on the lane dimension (C multiple of 128 for full MXU
tiles; the paired 128-wide towers hit this exactly).  The input is pre-padded
by 1 pixel on H/W; each grid step DMAs its (TH+2)-row halo window from HBM
into VMEM scratch (double-buffer-free: the window read overlaps the previous
tile's compute through the pallas pipeline).

Interface works on NCHW tensors (the package convention) and handles the
layout conversion; ``fused_residual_block_reference`` is the jnp oracle used
by tests and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_residual_block_reference(x, w3, b3, w1, b1):
    """x: (B, C, H, W); w3: (Cout, C, 3, 3) OIHW; w1: (Cout2, Cout) 1x1.
    Returns elu(conv3x3(x)+b3) @ w1 + b1 + x  (Cout2 == C)."""
    y = jax.lax.conv_general_dilated(
        x, w3.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    y = jax.nn.elu(y + b3[None, :, None, None].astype(jnp.float32))
    z = jnp.einsum("oc,bchw->bohw", w1.astype(jnp.float32), y,
                   preferred_element_type=jnp.float32)
    z = z + b1[None, :, None, None].astype(jnp.float32)
    return (z + x.astype(jnp.float32)).astype(x.dtype)


def _kernel(x_hbm, w3_ref, b3_ref, w1_ref, b1_ref, out_ref, scratch, sem, *,
            th, w, c, cout, wpad):
    b_ix = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_hbm.at[b_ix, pl.ds(i * th, th + 2)], scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((th * w, cout), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            lhs = scratch[dh:dh + th, dw:dw + w, :].reshape(th * w, c)
            acc += jnp.dot(lhs, w3_ref[dh, dw],
                           preferred_element_type=jnp.float32)
    pre = acc + b3_ref[0].astype(jnp.float32)
    # manual ELU: Pallas TPU lacks an expm1 lowering
    y = jnp.where(pre > 0, pre, jnp.exp(jnp.minimum(pre, 0.0)) - 1.0)
    z = jnp.dot(y.astype(x_hbm.dtype), w1_ref[...],
                preferred_element_type=jnp.float32)
    z = z + b1_ref[0].astype(jnp.float32)
    xc = scratch[1:1 + th, 1:1 + w, :].reshape(th * w, c).astype(jnp.float32)
    out_ref[...] = (z + xc).astype(out_ref.dtype).reshape(1, th, w, c)


def _pick_th(h, w, c, itemsize):
    # scratch (th+2, ~w+8, c) + out (th, w, c) + acc f32 (th*w, c): keep ~6MB
    for th in (32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        vmem = ((th + 2) * (w + 2) * c * itemsize      # scratch
                + th * w * c * itemsize * 2            # out block (x2 pipeline)
                + th * w * c * 4 * 2)                  # acc + elu temp
        if vmem <= 6 * 1024 * 1024:
            return th
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_residual_block(x, w3, b3, w1, b1, interpret: bool = False):
    """Fused [3x3 conv + bias -> ELU -> 1x1 conv + bias -> +residual].

    x: (B, C, H, W) with C == Cout == Cout2 (residual) and ideally C % 128
    == 0; falls back to the XLA reference off-TPU or for odd shapes."""
    b, c, h, w = x.shape
    cout = w3.shape[0]
    on_tpu = False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        pass
    if (not interpret and not on_tpu) or cout != c:
        return fused_residual_block_reference(x, w3, b3, w1, b1)

    xh = jnp.transpose(x, (0, 2, 3, 1))                 # NHWC
    # W must pad to a multiple of 8: mosaic requires HBM slice shapes
    # aligned to the (8, 128) tiling on the two minor dims
    wpad = -(-(w + 2) // 8) * 8
    xh = jnp.pad(xh, ((0, 0), (1, 1), (1, wpad - w - 1), (0, 0)))
    w3h = jnp.transpose(w3, (2, 3, 1, 0)).astype(x.dtype)   # (3,3,C,Cout)
    w1h = jnp.transpose(w1, (1, 0)).astype(x.dtype)         # (C, Cout2)
    th = _pick_th(h, w, c, x.dtype.itemsize)

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, w=w, c=c, cout=cout, wpad=wpad),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),       # x stays in HBM
            pl.BlockSpec((3, 3, c, cout), lambda bb, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((c, cout), lambda bb, i: (0, 0)),
            pl.BlockSpec((1, cout), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, c),
                               lambda bb, i: (bb, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wpad, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xh, w3h, b3.astype(x.dtype)[None], w1h, b1.astype(x.dtype)[None])
    return jnp.transpose(out, (0, 3, 1, 2))
