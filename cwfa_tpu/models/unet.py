"""Padding U-Net with additive skips (reference unet.py:9-195).

Distinctive choices reproduced from the reference:
- downsampling via max-pool to exactly half the size
  (adaptive_max_pool2d_with_indices at unet.py:79);
- channel dropout (Dropout2d) after every pool and every up block
  (unet.py:80,86);
- up path uses ConvTranspose2d(k=2, s=2) and an ADDITIVE (not concat) skip
  (unet.py:190: ``out = up + crop1``);
- 'last' head = 1x1 conv + activation (unet.py:67-69);
- per-site PReLU parameters (activation class instantiated per use).

Functional signature: a static ``UNetSpec`` describes structure, ``params``
holds learnables, ``state`` threads BatchNorm running statistics.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from cwfa_tpu import nn as cnn


@dataclass(frozen=True)
class UNetSpec:
    in_channels: int
    n_classes: int
    depth: int = 5
    wf: int = 6
    batch_norm: bool = True
    use_bias: bool = False
    skip_conn: bool = False
    drop_out: float = 0.0
    activation: str = "prelu"   # prelu | elu | leaky_relu | softplus


def _init_act(activation):
    return cnn.init_prelu() if activation == "prelu" else {}


def _act(activation, params, x):
    if activation == "prelu":
        return cnn.prelu(params, x)
    if activation == "elu":
        return cnn.elu(x)
    if activation == "leaky_relu":
        return cnn.leaky_relu(x)
    if activation == "softplus":
        return cnn.softplus(x)
    raise ValueError(activation)


def _init_conv_block(key, c_in, c_out, batch_norm, use_bias, activation):
    ks = cnn.key_iter(key)
    params = {
        "conv1": cnn.init_conv2d(next(ks), c_in, c_out, 3, with_bias=use_bias),
        "act1": _init_act(activation),
        "conv2": cnn.init_conv2d(next(ks), c_out, c_out, 3, with_bias=use_bias),
        "act2": _init_act(activation),
    }
    state = {}
    if batch_norm:
        params["bn1"], state["bn1"] = cnn.init_batchnorm(c_out)
        params["bn2"], state["bn2"] = cnn.init_batchnorm(c_out)
    return params, state


def _conv_block(params, state, x, *, train, activation, conv_fn=None,
                site=()):
    cf = conv_fn or (lambda _s, p, v: cnn.conv2d(p, v))
    new_state = dict(state)
    y = _act(activation, params["act1"], cf(site + ("conv1",),
                                            params["conv1"], x))
    if "bn1" in params:
        y, new_state["bn1"] = cnn.batchnorm(params["bn1"], state["bn1"], y, train)
    y = _act(activation, params["act2"], cf(site + ("conv2",),
                                            params["conv2"], y))
    if "bn2" in params:
        y, new_state["bn2"] = cnn.batchnorm(params["bn2"], state["bn2"], y, train)
    return y, new_state


def init_unet(key, spec: UNetSpec):
    ks = cnn.key_iter(key)
    params = {"down": [], "up": []}
    state = {"down": [], "up": []}
    prev = spec.in_channels
    for i in range(spec.depth):
        p, s = _init_conv_block(next(ks), prev, 2 ** (spec.wf + i),
                                spec.batch_norm, spec.use_bias, spec.activation)
        params["down"].append(p)
        state["down"].append(s)
        prev = 2 ** (spec.wf + i)
    for i in reversed(range(spec.depth - 1)):
        out_size = 2 ** (spec.wf + i)
        up_p = {"up": cnn.init_conv_transpose2d(next(ks), prev, out_size, 2, 2,
                                                with_bias=spec.use_bias)}
        # the skip is ADDITIVE (unet.py:190), so the conv-block input width
        # is out_size either way (prev//2 == out_size here)
        cb_in = out_size
        p, s = _init_conv_block(next(ks), cb_in, out_size, spec.batch_norm,
                                spec.use_bias, spec.activation)
        up_p["conv_block"] = p
        params["up"].append(up_p)
        state["up"].append(s)
        prev = out_size
    params["last"] = {"conv": cnn.init_conv2d(next(ks), prev, spec.n_classes, 1,
                                              with_bias=spec.use_bias),
                      "act": _init_act(spec.activation)}
    return params, state


def _center_crop(layer, th, tw):
    _, _, h, w = layer.shape
    dy, dx = (h - th) // 2, (w - tw) // 2
    return layer[:, :, dy:dy + th, dx:dx + tw]


def unet(spec: UNetSpec, params, state, x, *, train=False, rng=None,
         conv_fn=None, upconv_fn=None):
    """x: (B, C, H, W); H, W must be divisible by 2^(depth-1).

    conv_fn(site, conv_params, x) / upconv_fn(site, params, x): optional
    overrides for every 3x3/1x1 conv and transposed conv — the hook used by
    the int8 inference path (``unet_quantized``) and its calibration, so
    all three share this exact forward structure."""
    cf = conv_fn or (lambda _s, p, v: cnn.conv2d(p, v))
    uf = upconv_fn or (lambda _s, p, v: cnn.conv_transpose2d(p, v))
    rngs = cnn.key_iter(rng) if rng is not None else None
    nxt = (lambda: next(rngs)) if rngs is not None else (lambda: None)
    drop = spec.drop_out if train else 0.0
    new_state = {"down": [], "up": []}
    blocks = []
    for i in range(spec.depth):
        x, s = _conv_block(params["down"][i], state["down"][i], x, train=train,
                           activation=spec.activation, conv_fn=conv_fn,
                           site=("down", i))
        new_state["down"].append(s)
        if i != spec.depth - 1:
            blocks.append(x)
            x = cnn.adaptive_max_pool2d_half(x)
            x = cnn.dropout2d(x, drop, nxt())
    for i, up_p in enumerate(params["up"]):
        up = uf(("up", i, "upconv"), up_p["up"], x)
        if spec.skip_conn:
            bridge = _center_crop(blocks[-i - 1], up.shape[2], up.shape[3])
            up = up + bridge  # additive skip (unet.py:190)
        x, s = _conv_block(up_p["conv_block"], state["up"][i], up, train=train,
                           activation=spec.activation, conv_fn=conv_fn,
                           site=("up", i))
        new_state["up"].append(s)
        x = cnn.dropout2d(x, drop, nxt())
    x = _act(spec.activation, params["last"]["act"],
             cf(("last",), params["last"]["conv"], x))
    return x, new_state


# ---------------------------------------------------------------------------
# int8 inference path (round 2)
#
# The LRNN UNet is ~2.3 TFLOP/frame of 256/512/1024-channel convs — unlike
# the N=128 flow towers these are deep-N GEMMs where the v5e MXU's 2x int8
# rate engages (measured 117/164/207 TOP/s vs 86/112/133 TF/s bf16 at the
# three level shapes, scripts/bench_unet_int8.py).  Scheme mirrors
# ops/qtower: static per-channel activation scales calibrated on sample
# frames, folded into per-output-channel int8 weights; epilogues
# (bias/PReLU/BN) stay in the compute dtype.  Eval-only.
# ---------------------------------------------------------------------------


def _q_w_conv(w, s_in, transposed=False):
    """f32 conv weights -> int8 + (O,) scale, with the input site's
    per-channel activation scale folded in.  Layout OIHW, or (I, O, kH, kW)
    for transposed convs (torch ConvTranspose2d convention)."""
    w = w.astype(jnp.float32)
    if transposed:
        w = w * s_in[:, None, None, None]
        amax = jnp.max(jnp.abs(w), axis=(0, 2, 3))
        q = w / jnp.where(amax > 0, amax / 127.0, 1.0)[None, :, None, None]
    else:
        w = w * s_in[None, :, None, None]
        amax = jnp.max(jnp.abs(w), axis=(1, 2, 3))
        q = w / jnp.where(amax > 0, amax / 127.0, 1.0)[:, None, None, None]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(q), -127, 127)
    return q.astype(jnp.int8), scale


def _act_scale(v):
    a = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(0, 2, 3)) / 127.0
    return jnp.where(a > 0, a, 1.0)


def unet_calibrate(spec: UNetSpec, params, state, x, margin: float = 1.0):
    """Per-channel absmax activation scales for every conv input, from an
    eval-mode forward on calibration inputs x. Returns {site: (Cin,) f32}."""
    scales = {}

    def rec(site, p, v):
        scales[site] = _act_scale(v) * margin
        return cnn.conv2d(p, v)

    def rec_up(site, p, v):
        scales[site] = _act_scale(v) * margin
        return cnn.conv_transpose2d(p, v)

    unet(spec, params, state, x, train=False, conv_fn=rec, upconv_fn=rec_up)
    return scales


def quantize_unet(spec: UNetSpec, params, act_scales):
    """Pack int8 weights (+ f32 dequant scales) for every conv site.
    Returns {site: {"wq", "sw"}}; biases stay in ``params``."""
    packs = {}
    for site, s_in in act_scales.items():
        if site[0] == "down":
            conv = params["down"][site[1]][site[2]]
        elif site[0] == "up" and site[-1] == "upconv":
            conv = params["up"][site[1]]["up"]
        elif site[0] == "up":
            conv = params["up"][site[1]]["conv_block"][site[2]]
        else:
            conv = params["last"]["conv"]
        wq, sw = _q_w_conv(conv["w"], s_in,
                           transposed=site[-1] == "upconv")
        packs[site] = {"wq": wq, "sw": sw}
    return packs


def _conv_int8(qp, s_in, p, v, transposed=False):
    """Quantize v per-channel, run the int8 conv, dequantize + bias."""
    dt = v.dtype
    q = jnp.clip(jnp.round(v.astype(jnp.float32)
                           / s_in[None, :, None, None]),
                 -127, 127).astype(jnp.int8)
    if transposed:
        acc = jax.lax.conv_transpose(
            q, qp["wq"], strides=(2, 2), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            transpose_kernel=True, preferred_element_type=jnp.int32)
    else:
        acc = jax.lax.conv_general_dilated(
            q, qp["wq"], (1, 1),
            "SAME" if qp["wq"].shape[-1] > 1 else "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * qp["sw"][None, :, None, None]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)[None, :, None, None]
    return y.astype(dt)


def unet_quantized(spec: UNetSpec, params, state, x, qpack, act_scales):
    """Eval-only forward with every conv in int8 (weights from
    ``quantize_unet``, activations quantized per-channel on the fly)."""

    def cf(site, p, v):
        return _conv_int8(qpack[site], act_scales[site], p, v)

    def uf(site, p, v):
        return _conv_int8(qpack[site], act_scales[site], p, v,
                          transposed=True)

    return unet(spec, params, state, x, train=False, conv_fn=cf,
                upconv_fn=uf)
