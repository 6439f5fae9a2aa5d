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


def _conv_block(params, state, x, *, train, activation):
    new_state = dict(state)
    y = _act(activation, params["act1"], cnn.conv2d(params["conv1"], x))
    if "bn1" in params:
        y, new_state["bn1"] = cnn.batchnorm(params["bn1"], state["bn1"], y, train)
    y = _act(activation, params["act2"], cnn.conv2d(params["conv2"], y))
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
        cb_in = prev // 2 if spec.skip_conn else out_size
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


def unet(spec: UNetSpec, params, state, x, *, train=False, rng=None):
    """x: (B, C, H, W); H, W must be divisible by 2^(depth-1)."""
    rngs = cnn.key_iter(rng) if rng is not None else None
    nxt = (lambda: next(rngs)) if rngs is not None else (lambda: None)
    drop = spec.drop_out if train else 0.0
    new_state = {"down": [], "up": []}
    blocks = []
    for i in range(spec.depth):
        x, s = _conv_block(params["down"][i], state["down"][i], x, train=train,
                           activation=spec.activation)
        new_state["down"].append(s)
        if i != spec.depth - 1:
            blocks.append(x)
            x = cnn.adaptive_max_pool2d_half(x)
            x = cnn.dropout2d(x, drop, nxt())
    for i, up_p in enumerate(params["up"]):
        up = cnn.conv_transpose2d(up_p["up"], x)
        if spec.skip_conn:
            bridge = _center_crop(blocks[-i - 1], up.shape[2], up.shape[3])
            up = up + bridge  # additive skip (unet.py:190)
        x, s = _conv_block(up_p["conv_block"], state["up"][i], up, train=train,
                           activation=spec.activation)
        new_state["up"].append(s)
        x = cnn.dropout2d(x, drop, nxt())
    x = _act(spec.activation, params["last"]["act"],
             cnn.conv2d(params["last"]["conv"], x))
    return x, new_state
