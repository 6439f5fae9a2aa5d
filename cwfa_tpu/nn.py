"""Minimal functional NN layer library used across cwfa_tpu.

Design: every layer is a pair of plain functions

    init_*(key, ...) -> params          (a pytree of jnp arrays)
    *_apply(params, x, ...) -> y        (pure; jit/vmap/grad friendly)

Stateful layers (BatchNorm) additionally thread an explicit ``state`` pytree,
and stochastic layers (Dropout) take an explicit PRNG key — there is no module
object and no hidden mutation, which is what lets whole models compile into a
single XLA program.

Initializers intentionally reproduce the torch defaults the reference relies
on (reference: networks.py:19-96 applies kaiming/xavier initializers on top of
torch's conv defaults), so that distributions of freshly initialized
parameters match the PyTorch reference.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Initializers (torch-compatible distributions)
# ---------------------------------------------------------------------------


def _fan_in_out(shape_oihw: Sequence[int]) -> tuple[int, int]:
    """fan_in / fan_out for an OIHW(/OIDHW/OI) weight."""
    out_ch, in_ch = shape_oihw[0], shape_oihw[1]
    receptive = int(np.prod(shape_oihw[2:])) if len(shape_oihw) > 2 else 1
    return in_ch * receptive, out_ch * receptive


def kaiming_uniform(key, shape, a: float = 0.0, dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ for OIHW weights (fan_in mode)."""
    fan_in, _ = _fan_in_out(shape)
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, gain: float = 1.0, dtype=jnp.float32):
    fan_in, fan_out = _fan_in_out(shape)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_default_conv_init(key, w_shape, with_bias: bool, dtype=jnp.float32):
    """torch Conv{1,2,3}d / Linear default: kaiming_uniform(a=sqrt(5)) weights,
    bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    w = kaiming_uniform(kw, w_shape, a=math.sqrt(5.0), dtype=dtype)
    if not with_bias:
        return w, None
    fan_in, _ = _fan_in_out(w_shape)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    b = jax.random.uniform(kb, (w_shape[0],), dtype, -bound, bound)
    return w, b


# Reference weight-init library (networks.py:19-96): these mimic net.apply(fn)
# on a conv layer that already carries torch-default weights/bias.

def subnet_init(key, w_shape, with_bias=True, dtype=jnp.float32):
    """reference subnet_initialization: kaiming_uniform weights, bias*0.1."""
    kw, kb = jax.random.split(key)
    w = kaiming_uniform(kw, w_shape, a=0.0, dtype=dtype)
    b = None
    if with_bias:
        _, b0 = torch_default_conv_init(kb, w_shape, True, dtype)
        b = b0 * 0.1
    return w, b


def subnet_init_small(key, w_shape, with_bias=True, dtype=jnp.float32):
    """reference subnet_initialization_small: xavier(0.01) weights, bias*0.01."""
    kw, kb = jax.random.split(key)
    w = xavier_uniform(kw, w_shape, gain=0.01, dtype=dtype)
    b = None
    if with_bias:
        _, b0 = torch_default_conv_init(kb, w_shape, True, dtype)
        b = b0 * 0.01
    return w, b


def subnet_init_positive(key, w_shape, with_bias=True, dtype=jnp.float32):
    """reference subnet_initialization_positive: |xavier(0.1)| weights, bias*0.1."""
    kw, kb = jax.random.split(key)
    w = jnp.abs(xavier_uniform(kw, w_shape, gain=0.1, dtype=dtype))
    b = None
    if with_bias:
        _, b0 = torch_default_conv_init(kb, w_shape, True, dtype)
        b = b0 * 0.1
    return w, b


def zero_init(key, w_shape, with_bias=True, dtype=jnp.float32):
    w = jnp.zeros(w_shape, dtype)
    b = jnp.zeros((w_shape[0],), dtype) if with_bias else None
    return w, b


# ---------------------------------------------------------------------------
# Convolutions (logical NCHW / NCDHW; XLA picks physical TPU layouts)
# ---------------------------------------------------------------------------

_DIMNUMS_2D = ("NCHW", "OIHW", "NCHW")
_DIMNUMS_3D = ("NCDHW", "OIDHW", "NCDHW")


def init_conv2d(key, c_in, c_out, k, init=torch_default_conv_init,
                with_bias=True, dtype=jnp.float32):
    if isinstance(k, int):
        k = (k, k)
    w, b = init(key, (c_out, c_in, *k), with_bias, dtype=dtype)
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def _acc_dtype(x):
    """preferred_element_type for convolutions: f32 accumulation for f32
    inputs; None for bf16 (the MXU accumulates bf16 convs in f32 in hardware
    and rounds once at the output — identical numerics — while an explicit
    f32 preferred_element_type breaks the conv TRANSPOSE rule under autodiff:
    the f32 cotangent meets the bf16 weight and lax rejects the mixed-dtype
    conv, which would make bf16-AMP training untraceable)."""
    return None if x.dtype == jnp.bfloat16 else jnp.float32


def conv2d(params, x, stride=1, padding="SAME", dilation=1):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 2
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=dilation, dimension_numbers=_DIMNUMS_2D,
        preferred_element_type=_acc_dtype(x),
    ).astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)[None, :, None, None]
    return y


def init_conv3d(key, c_in, c_out, k, init=torch_default_conv_init,
                with_bias=True, dtype=jnp.float32):
    if isinstance(k, int):
        k = (k, k, k)
    w, b = init(key, (c_out, c_in, *k), with_bias, dtype=dtype)
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def conv3d(params, x, stride=1, padding="SAME"):
    if isinstance(stride, int):
        stride = (stride, stride, stride)
    if isinstance(padding, int):
        padding = [(padding, padding)] * 3
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=_DIMNUMS_3D, preferred_element_type=_acc_dtype(x),
    ).astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)[None, :, None, None, None]
    return y


def init_conv_transpose2d(key, c_in, c_out, k, stride,
                          init=torch_default_conv_init, with_bias=True,
                          dtype=jnp.float32):
    """torch ConvTranspose2d weight layout is (in, out, kH, kW); torch computes
    fan_in from dim-1 (out*k*k), which _fan_in_out reproduces on (I,O,kH,kW)."""
    if isinstance(k, int):
        k = (k, k)
    kw, kb = jax.random.split(key)
    w, _ = init(kw, (c_in, c_out, *k), False, dtype=dtype)
    p = {"w": w}
    if with_bias:
        # torch bias: shape (c_out,), bound 1/sqrt(fan_in) with
        # fan_in = weight.size(1) * k * k = c_out * k * k
        fan_in = c_out * int(np.prod(k))
        bound = 1.0 / math.sqrt(fan_in)
        p["b"] = jax.random.uniform(kb, (c_out,), dtype, -bound, bound)
    return p


def conv_transpose2d(params, x, stride=2):
    """Equivalent of torch ConvTranspose2d(k, stride, padding=0)."""
    w = params["w"].astype(x.dtype)  # (I, O, kH, kW)
    if isinstance(stride, int):
        stride = (stride, stride)
    # torch ConvTranspose2d weight (in, out, kH, kW) is the OIHW kernel of the
    # corresponding forward conv (out->in); transpose_kernel=True makes
    # lax.conv_transpose compute exactly that gradient-of-conv.
    y = jax.lax.conv_transpose(
        x, w, strides=stride, padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        transpose_kernel=True,
        preferred_element_type=_acc_dtype(x),
    ).astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)[None, :, None, None]
    return y


def init_linear(key, d_in, d_out, init=torch_default_conv_init,
                with_bias=True, dtype=jnp.float32):
    w, b = init(key, (d_out, d_in), with_bias, dtype=dtype)
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def linear(params, x):
    y = x @ params["w"].astype(x.dtype).T
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    return y


def init_conv1d(key, c_in, c_out, k, init=torch_default_conv_init,
                with_bias=True, dtype=jnp.float32):
    w, b = init(key, (c_out, c_in, k), with_bias, dtype=dtype)
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def conv1d(params, x, padding="SAME"):
    """x: (B, C, L)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    w = params["w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=padding,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=_acc_dtype(x),
    ).astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)[None, :, None]
    return y


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def init_prelu(num_parameters: int = 1, init: float = 0.25, dtype=jnp.float32):
    return {"alpha": jnp.full((num_parameters,), init, dtype)}


def prelu(params, x):
    a = params["alpha"].astype(x.dtype)
    if a.shape[0] == 1:
        a = a[0]
    else:  # per-channel (broadcast over trailing spatial dims)
        a = a.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, a * x)


def elu(x):
    return jax.nn.elu(x)


def leaky_relu(x, slope=0.01):
    return jax.nn.leaky_relu(x, slope)


def softplus(x, beta=1.0):
    return jax.nn.softplus(beta * x) / beta


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def init_batchnorm(c, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype),
             "count": jnp.zeros((), jnp.int32)}
    return params, state


def batchnorm(params, state, x, train: bool, momentum: float = 0.1,
              eps: float = 1e-5):
    """torch BatchNorm2d semantics on NC... tensors. Returns (y, new_state)."""
    reduce_axes = (0,) + tuple(range(2, x.ndim))
    bshape = (1, -1) + (1,) * (x.ndim - 2)
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.var(xf, axis=reduce_axes)
        n = x.size // x.shape[1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean.reshape(bshape).astype(x.dtype)) * inv.reshape(bshape).astype(x.dtype)
    y = y * params["scale"].reshape(bshape).astype(x.dtype) \
        + params["bias"].reshape(bshape).astype(x.dtype)
    return y, new_state


def init_layernorm(shape, dtype=jnp.float32):
    shape = (shape,) if isinstance(shape, int) else tuple(shape)
    return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}


def layernorm(params, x, eps: float = 1e-6):
    """Normalizes over the trailing len(scale.shape) dims (torch F.layer_norm)."""
    nd = params["scale"].ndim
    axes = tuple(range(x.ndim - nd, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.var(xf, axis=axes, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout family (explicit PRNG; inactive when rng is None or rate==0)
# ---------------------------------------------------------------------------


def dropout(x, rate: float, rng):
    if rng is None or rate == 0.0:
        return x
    if rate >= 1.0:      # torch: p=1 gives clean zeros / zero grads
        return jnp.zeros_like(x)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def dropout2d(x, rate: float, rng):
    """Channel dropout on (B, C, H, W) — zeroes whole channels (torch Dropout2d)."""
    if rng is None or rate == 0.0:
        return x
    if rate >= 1.0:
        # torch semantics: p=1 returns clean zeros with zero grads; the
        # x/keep form below would emit NaN gradients through the 1/0
        return jnp.zeros_like(x)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape[:2])
    return jnp.where(mask[(...,) + (None,) * (x.ndim - 2)], x / keep, 0.0).astype(x.dtype)


dropout3d = dropout2d  # same semantics: drops (B, C) feature maps entirely


def drop_path(x, rate: float, rng):
    """Stochastic depth on the batch dim (reference networks.py:370-385)."""
    if rng is None or rate == 0.0:
        return x
    if rate >= 1.0:      # x/0 * 0-mask is NaN in the FORWARD pass here
        return jnp.zeros_like(x)
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return (x / keep * mask).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------


def max_pool2d(x, k=2, stride=None):
    stride = stride or k
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, 1, k, k), (1, 1, stride, stride), "VALID")


def adaptive_max_pool2d_half(x):
    """reference unet.py:79 — adaptive_max_pool2d to size//2 == 2x2/2 maxpool
    for even inputs (the only case the CWFA UNet hits)."""
    return max_pool2d(x, 2, 2)


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def key_iter(key):
    """Infinite PRNG key splitter: k = next(it)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub
