"""XLFMNet baseline (--INN_net_type 2): direct views -> volume conv net.

Reference networks.py:758-787: Conv2d(29 -> depths, 3) -> BatchNorm ->
LeakyReLU -> UNet(depth=5, wf=6, ELU activations, no skip).  The SLNet_XLFMNet
predecessor model kept for comparison runs.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from cwfa_tpu import nn as cnn
from cwfa_tpu.models.unet import UNetSpec, init_unet, unet


@dataclass(frozen=True)
class XLFMNetSpec:
    in_views: int = 29
    out_depths: int = 96
    use_bias: bool = False
    unet: UNetSpec = None

    def __post_init__(self):
        if self.unet is None:
            # drop_out=0, NOT the reference's unet_settings default of 1.0
            # (networks.py:762): there it flows into F.dropout2d whose
            # functional default is training=True, so every channel is
            # dropped ALWAYS — the reference XLFMNet is untrainable as
            # declared (consistent with run_CWFA never building it).  A
            # default-constructed spec here must be a usable model.
            object.__setattr__(self, "unet", UNetSpec(
                in_channels=self.out_depths, n_classes=self.out_depths,
                depth=5, wf=6, batch_norm=True, use_bias=self.use_bias,
                skip_conn=False, drop_out=0.0, activation="elu"))


def init_xlfmnet(key, spec: XLFMNetSpec):
    k1, k2 = jax.random.split(key)
    params = {"proj": cnn.init_conv2d(k1, spec.in_views, spec.out_depths, 3,
                                      with_bias=spec.use_bias)}
    params["bn"], bn_state = cnn.init_batchnorm(spec.out_depths)
    params["unet"], unet_state = init_unet(k2, spec.unet)
    return params, {"bn": bn_state, "unet": unet_state}


def xlfmnet(spec: XLFMNetSpec, params, state, x, *, train=False, rng=None):
    y = cnn.conv2d(params["proj"], x)
    y, bn_state = cnn.batchnorm(params["bn"], state["bn"], y, train)
    y = cnn.leaky_relu(y)
    y, unet_state = unet(spec.unet, params["unet"], state["unet"], y,
                         train=train, rng=rng)
    return y, {"bn": bn_state, "unet": unet_state}
