"""Per-step condition processor Ω (reference cond_network).

Maps the 29 extracted lenslet views (B, 29, 512, 512) to the conditioning
feature volume (B, n_depths/2^{k+1}, 512, 512) for CWF step k.

Reference: networks.py:165-242.  One ResidualBlock:
  out  = PReLU( conv3x3(PReLU(conv3x3(x))) + conv3x3_downsample(x) )
  out  = Conv3d(32->1) ∘ Dropout3d(0.5) ∘ PReLU ∘ Conv3d(1->32)
         applied over a depth-as-last-axis layout (networks.py:221-239)
followed by no attention (GlobalAttention is constructed disabled at
networks.py:190).

PReLU sharing: the reference's ``activation=nn.PReLU()`` default argument is
evaluated once at class-definition time, aliasing a single learnable alpha
across every ResidualBlock instance in the process (a torch default-arg
quirk).  Here each cond_network owns one alpha shared across its three
activation sites — the in-block aliasing is preserved, the cross-network
aliasing (an accidental global) is deliberately dropped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cwfa_tpu import nn as cnn


def init_cond_network(key, c_in: int, c_out: int, chans_3d: int = 32):
    ks = jax.random.split(key, 6)
    return {
        "conv1": cnn.init_conv2d(ks[0], c_in, c_out, 3),
        "conv2": cnn.init_conv2d(ks[1], c_out, c_out, 3),
        "down": cnn.init_conv2d(ks[2], c_in, c_out, 3),
        "c3a": cnn.init_conv3d(ks[3], 1, chans_3d, 3),
        "c3b": cnn.init_conv3d(ks[4], chans_3d, 1, 3),
        "prelu": cnn.init_prelu(),
    }


def cond_network(params, x, *, train: bool = False, rng=None,
                 dropout3d_rate: float = 0.5):
    """x: (B, 29, H, W) -> (B, c_out, H, W)."""
    act = lambda u: cnn.prelu(params["prelu"], u)
    out = act(cnn.conv2d(params["conv1"], x))
    out = cnn.conv2d(params["conv2"], out)
    residual = cnn.conv2d(params["down"], x)
    out = act(out + residual)

    # 3-D conv over (H, W, C): (B, C, H, W) -> (B, 1, H, W, C)
    v = jnp.transpose(out, (0, 2, 3, 1))[:, None]
    v = act(cnn.conv3d(params["c3a"], v))
    v = cnn.dropout3d(v, dropout3d_rate if train else 0.0, rng)
    v = cnn.conv3d(params["c3b"], v)
    out = jnp.transpose(v[:, 0], (0, 3, 1, 2))
    return out


def init_global_attention(key, n_chans: int):
    """Conv1d(C,C,3) -> ReLU -> Conv1d(C,C,1) -> Sigmoid gate over flattened
    spatial dim (reference networks.py:244-262)."""
    k1, k2 = jax.random.split(key)
    return {
        "c1": cnn.init_conv1d(k1, n_chans, n_chans, 3),
        "c2": cnn.init_conv1d(k2, n_chans, n_chans, 1),
    }


def global_attention(params, x):
    b, c = x.shape[:2]
    flat = x.reshape(b, c, -1)
    y = jax.nn.relu(cnn.conv1d(params["c1"], flat, padding=1))
    y = jax.nn.sigmoid(cnn.conv1d(params["c2"], y, padding=0))
    return y.reshape(x.shape)
