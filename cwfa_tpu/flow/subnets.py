"""s,t-predicting subnetworks for the coupling blocks.

``wavelet_flow_subnet2d`` follows the Wavelet Flow paper design
(arXiv 2010.13821) as implemented in reference networks.py:586-706:

    b1 = 1x1 conv (in-proj)
    b2 = [3x3 conv -> ELU -> 1x1 conv](b1) + b1       (residual)
    b3 = ELU(b2); b4 = block(b3) + b3; b5 = ELU(b4); b6 = block(b5) + b5
    out = 3x3 conv(ELU(b6))

The ``_first`` variant (networks.py:684-706, normal=False) is used for the
input ConditionalAffineTransform of each CWF step: its input is the channel
concatenation [low_res_up_grad | cond] of the two conditions; it processes
only ``cond`` through the tower (predicting the scale s) and emits the
negative low-res gradient prior as the translation:
``concat(b7, -low_res_up_grad/sqrt(2))`` (networks.py:656-671).  The last conv
of the ``_first`` tower is 0.01-Xavier initialized (networks.py:706).

Width comes from the module-global ``networks_n_chans`` in the reference
(networks.py:273-274,604; --INN_internal_chans, default 64) — here it is an
explicit argument.

``subnet_conv`` is the generic ReLU conv stack (networks.py:98-117) available
for the non-default coupling types.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cwfa_tpu import nn as cnn

_SQRT2_INV = 1.0 / math.sqrt(2.0)


def _init_tower(keys, c_b1_in, c_out_conv, n_ch, use_bias, last_init):
    """Shared residual tower params; returns dict."""
    return {
        "b1": cnn.init_conv2d(keys[0], c_b1_in, n_ch, 1, with_bias=use_bias),
        "b2a": cnn.init_conv2d(keys[1], n_ch, n_ch, 3, with_bias=use_bias),
        "b2b": cnn.init_conv2d(keys[2], n_ch, n_ch, 1, with_bias=use_bias),
        "b4a": cnn.init_conv2d(keys[3], n_ch, n_ch, 3, with_bias=use_bias),
        "b4b": cnn.init_conv2d(keys[4], n_ch, n_ch, 1, with_bias=use_bias),
        "b6a": cnn.init_conv2d(keys[5], n_ch, n_ch, 3, with_bias=use_bias),
        "b6b": cnn.init_conv2d(keys[6], n_ch, n_ch, 1, with_bias=use_bias),
        "b7": cnn.init_conv2d(keys[7], n_ch, c_out_conv, 3,
                              init=last_init, with_bias=use_bias),
    }


def _tower(params, x):
    b1 = cnn.conv2d(params["b1"], x)
    b2 = cnn.conv2d(params["b2b"], cnn.elu(cnn.conv2d(params["b2a"], b1))) + b1
    b3 = cnn.elu(b2)
    b4 = cnn.conv2d(params["b4b"], cnn.elu(cnn.conv2d(params["b4a"], b3))) + b3
    b5 = cnn.elu(b4)
    b6 = cnn.conv2d(params["b6b"], cnn.elu(cnn.conv2d(params["b6a"], b5))) + b5
    return cnn.conv2d(params["b7"], cnn.elu(b6))


def init_wavelet_flow_subnet2d(key, c_in, c_out, n_ch=64, use_bias=True):
    keys = jax.random.split(key, 8)
    return _init_tower(keys, c_in, c_out, n_ch, use_bias,
                       last_init=cnn.torch_default_conv_init)


def wavelet_flow_subnet2d(params, x):
    """Normal variant: full input through the tower -> c_out channels."""
    return _tower(params, x)


def init_wavelet_flow_subnet2d_first(key, c_in, c_out, n_ch=64, use_bias=True):
    """c_in = 2n (concat of both conditions), c_out = 2n (s|t)."""
    keys = jax.random.split(key, 8)
    return _init_tower(keys, c_in // 2, c_out // 2, n_ch, use_bias,
                       last_init=cnn.subnet_init_small)


def wavelet_flow_subnet2d_first(params, x):
    """First variant: input = [low_res_up_grad | cond] halves; the tower sees
    only cond; output = concat(tower(cond), -low_res/sqrt(2))."""
    n = x.shape[1] // 2
    low_res, cond = x[:, :n], x[:, n:]
    b7 = _tower(params, cond)
    return jnp.concatenate(
        [b7, -low_res * jnp.asarray(_SQRT2_INV, x.dtype)], axis=1)


def init_subnet_conv(key, c_in, c_internal, c_out, use_bias=True):
    """Generic coupling subnet (networks.py:98-117): 3x3/3x3/1x1/1x1 + ReLU,
    kaiming-initialized."""
    keys = jax.random.split(key, 4)
    return {
        "c1": cnn.init_conv2d(keys[0], c_in, c_internal, 3,
                              init=cnn.subnet_init, with_bias=use_bias),
        "c2": cnn.init_conv2d(keys[1], c_internal, c_out, 3,
                              init=cnn.subnet_init, with_bias=use_bias),
        "c3": cnn.init_conv2d(keys[2], c_out, c_out, 1,
                              init=cnn.subnet_init, with_bias=use_bias),
        "c4": cnn.init_conv2d(keys[3], c_out, c_out, 1,
                              init=cnn.subnet_init, with_bias=use_bias),
    }


def subnet_conv(params, x):
    y = jax.nn.relu(cnn.conv2d(params["c1"], x))
    y = jax.nn.relu(cnn.conv2d(params["c2"], y))
    y = jax.nn.relu(cnn.conv2d(params["c3"], y))
    return cnn.conv2d(params["c4"], y)
