"""LRNN — the coarsest-step generator (reference networks.py:505-584).

Maps the 29 lenslet views directly to the lowest-resolution volume
(n_depths/2^{steps-1} = 6 depths at 512x512), optionally corrected by a
mean-volume spatial prior:

    x = UNet(Conv1x1_positive(views))                       (networks.py:536-542)
    x += ConvNeXt2(ConvNeXt1(mean_vol)) * 2*(attn(mean_vol)-0.5)
                                                            (networks.py:551-555)

ConvNeXt block (networks.py:468-503): 1x1 in-proj, then
[7x7 conv -> LayerNorm([C,S,S]) -> 1x1 conv -> GELU] with a drop-path residual
from the in-projection.  The LayerNorm carries a full (C, S, S) elementwise
affine — heavy, but reproduced from the reference.

``Encoder`` (networks.py:557-584) is the thin wrapper run_CWFA instantiates as
the last pyramid "cond net" (CWFA.py:495-496).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from cwfa_tpu import nn as cnn
from cwfa_tpu.models.cond_net import init_global_attention, global_attention
from cwfa_tpu.models.unet import UNetSpec, init_unet, unet


@dataclass(frozen=True)
class LRNNSpec:
    ch_in: int = 29
    n_depths: int = 6
    spatial: int = 512
    use_bias: bool = False
    unet: UNetSpec = None  # filled by __post_init__ when None
    convnext_width: int = 64
    convnext_drop: float = 0.05
    unet_drop: float = 0.005

    def __post_init__(self):
        if self.unet is None:
            object.__setattr__(self, "unet", UNetSpec(
                in_channels=self.n_depths, n_classes=self.n_depths,
                depth=3, wf=8, batch_norm=True, use_bias=self.use_bias,
                skip_conn=True, drop_out=self.unet_drop))


def _init_convnext(key, c_in, c_out, size):
    ks = cnn.key_iter(key)
    return {
        "inp": cnn.init_conv2d(next(ks), c_in, c_out, 1),
        "dw": cnn.init_conv2d(next(ks), c_out, c_out, 7),
        "ln": cnn.init_layernorm((c_out, size, size)),
        "pw": cnn.init_conv2d(next(ks), c_out, c_out, 1),
    }


def _convnext(params, x, drop_prob, *, train, rng):
    up = cnn.conv2d(params["inp"], x)
    y = cnn.conv2d(params["dw"], up)
    y = cnn.layernorm(params["ln"], y, eps=1e-5)
    y = jax.nn.gelu(cnn.conv2d(params["pw"], y), approximate=False)
    return y + cnn.drop_path(up, drop_prob if train else 0.0, rng)


def init_lrnn(key, spec: LRNNSpec):
    ks = cnn.key_iter(key)
    params = {
        "proj": cnn.init_conv2d(next(ks), spec.ch_in, spec.n_depths, 1,
                                init=cnn.subnet_init_positive,
                                with_bias=spec.use_bias),
        "cnx1": _init_convnext(next(ks), spec.n_depths, spec.convnext_width,
                               spec.spatial),
        "cnx2": _init_convnext(next(ks), spec.convnext_width, spec.n_depths,
                               spec.spatial),
        "attn": init_global_attention(next(ks), spec.n_depths),
    }
    params["unet"], unet_state = init_unet(next(ks), spec.unet)
    return params, {"unet": unet_state}


def lrnn_mean_branch(spec: LRNNSpec, params, mean_vol, *, train=False,
                     rng=None):
    """The mean-volume correction term ``cnx2(cnx1(m)) * 2*(attn(m)-0.5)``
    (reference networks.py:551-555).

    This is a pure function of ``mean_vol`` — which at inference time is the
    per-dataset mean-volume cache, constant across frames — so the inference
    pipeline precomputes it once per cache instead of re-running two ConvNeXt
    blocks (incl. a dense 7x7 64-wide conv) and the attention gate per frame
    (see XLFMReconstructor)."""
    rngs = cnn.key_iter(rng) if rng is not None else None
    nxt = (lambda: next(rngs)) if rngs is not None else (lambda: None)
    m = _convnext(params["cnx1"], mean_vol, spec.convnext_drop,
                  train=train, rng=nxt())
    m = _convnext(params["cnx2"], m, spec.convnext_drop,
                  train=train, rng=nxt())
    gate = 2.0 * (global_attention(params["attn"], mean_vol) - 0.5)
    return m * gate


def lrnn(spec: LRNNSpec, params, state, x, mean_vol=None, *, train=False,
         rng=None, mean_branch=None, unet_q=None):
    """x: (B, 29, H, W); mean_vol: (B, n_depths, H, W) or None.
    Returns (volume, new_state).

    mean_branch: optional precomputed ``lrnn_mean_branch`` output (broadcast
    over the batch); when given, mean_vol is ignored.
    unet_q: optional int8 UNet pack ({"qpack", "scales"} from
    models/unet.quantize_unet) — eval-only quantized inference."""
    rngs = cnn.key_iter(rng) if rng is not None else None
    nxt = (lambda: next(rngs)) if rngs is not None else (lambda: None)
    y = cnn.conv2d(params["proj"], x)
    if unet_q is not None and not train:
        from cwfa_tpu.models.unet import unet_quantized
        y, unet_state = unet_quantized(spec.unet, params["unet"],
                                       state["unet"], y,
                                       unet_q["qpack"], unet_q["scales"])
    else:
        y, unet_state = unet(spec.unet, params["unet"], state["unet"], y,
                             train=train, rng=nxt())
    if mean_branch is not None:
        y = y + mean_branch
    elif mean_vol is not None:
        y = y + lrnn_mean_branch(spec, params, mean_vol, train=train,
                                 rng=nxt())
    return y, {"unet": unet_state}


# Encoder wrapper (reference networks.py:557-584)

def init_encoder(key, c_in, c_out, spatial=512, use_bias=False):
    spec = LRNNSpec(ch_in=c_in, n_depths=c_out, spatial=spatial,
                    use_bias=use_bias)
    params, state = init_lrnn(key, spec)
    return spec, params, state


def encoder(spec, params, state, im_in, mean_vol=None, *, train=False, rng=None):
    return lrnn(spec, params, state, im_in, mean_vol, train=train, rng=rng)
