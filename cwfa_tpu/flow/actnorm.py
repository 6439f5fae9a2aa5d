"""ActNorm: per-channel affine with data-dependent initialization.

Reference: FrEIA/modules/invertible_resnet.py:11-85.  The reference
initializes log-scale/bias from the first batch it sees at runtime
(``init_on_next_batch``); in JAX that impurity becomes an explicit init pass
(``actnorm_data_init``) that computes parameters from a sample batch before
anything is jitted — the apply function is pure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_actnorm(channels: int, ndim_spatial: int = 2, dtype=jnp.float32):
    shape = (1, channels) + (1,) * ndim_spatial
    return {"log_scale": jnp.zeros(shape, dtype), "bias": jnp.zeros(shape, dtype)}


def actnorm_data_init(x: jax.Array):
    """Compute ActNorm params so the first batch maps to zero-mean/unit-std
    per channel (invertible_resnet.py:54-66): y = (x - mean)/std."""
    axes = (0,) + tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    std = jnp.std(xf, axis=axes, keepdims=True, ddof=0)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    log_scale = -jnp.log(std)
    bias = -mean / std
    return {"log_scale": log_scale[0:1], "bias": bias[0:1]}


def actnorm(params, x: jax.Array, rev: bool = False):
    """y = exp(log_scale)*x + bias; logdet = n_pixels * sum(log_scale)."""
    ls = params["log_scale"].astype(jnp.float32)
    n_pixels = float(np.prod(x.shape[2:]))
    jac = n_pixels * jnp.sum(ls)
    b = x.shape[0]
    if rev:
        y = (x - params["bias"].astype(x.dtype)) * jnp.exp(-ls).astype(x.dtype)
        logdet = jnp.full((b,), 1.0, jnp.float32) * (-jac)
    else:
        y = x * jnp.exp(ls).astype(x.dtype) + params["bias"].astype(x.dtype)
        logdet = jnp.full((b,), 1.0, jnp.float32) * jac
    return y, logdet
