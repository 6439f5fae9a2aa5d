"""Remaining invertible-op library for full FrEIA-surface parity.

The CWFA main path never touches these (SURVEY.md §2.4 rows F3, F9, F12-F17),
but the reference ships them as part of its flow runtime, so users of that
library surface find them here — same pure-function convention
``op(params, x, rev) -> (y, logdet)``.

- fixed linear / 1x1-conv transforms      (FrEIA fixed_transforms.py:50-133)
- i-RevNet down/upsampling, flatten/reshape (FrEIA reshapes.py:12-193,321-446)
- 2D<->3D layout changes                  (reference INN_utils.py:18-124)
- orthogonal / householder transforms     (FrEIA orthogonal.py:7-231)
- invertible autoencoder activations/layers (FrEIA inv_auto_layers.py:12-272)
- i-ResNet layer with Hutchinson log-det  (FrEIA invertible_resnet.py:89-234)
- Gaussian mixture model head             (FrEIA gaussian_mixture.py:7-174)
- sequential INN combinator               (FrEIA framework/sequence_inn.py)
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _batch(x):
    return x.shape[0]


# ---------------------------------------------------------------------------
# Fixed linear transforms (F9)
# ---------------------------------------------------------------------------


def init_fixed_linear(m: np.ndarray, b: np.ndarray | None = None):
    m = np.asarray(m, np.float32)
    sign, logdet = np.linalg.slogdet(m)
    return {"m": jnp.asarray(m), "m_inv": jnp.asarray(np.linalg.inv(m)),
            "b": jnp.asarray(b if b is not None else np.zeros(m.shape[0],
                                                              np.float32)),
            "logdet": jnp.asarray(logdet, jnp.float32)}


def fixed_linear(params, x, rev=False):
    """y = x M^T + b on (B, D) vectors (FrEIA stores M transposed and does
    x.mm(M.t()); behaviorally y_i = sum_j M[i,j] x_j + b_i)."""
    j = jnp.broadcast_to(params["logdet"], (x.shape[0],))
    if rev:
        return (x - params["b"]) @ params["m_inv"].T, -j
    return x @ params["m"].T + params["b"], j


def fixed_1x1_conv(params, x, rev=False):
    """Per-pixel channel matmul on (B, C, H, W)."""
    n_pixels = float(np.prod(x.shape[2:]))
    j = jnp.broadcast_to(params["logdet"] * n_pixels, (x.shape[0],))
    m = params["m_inv"] if rev else params["m"]
    y = jnp.einsum("oc,bchw->bohw", m, x)
    return y, (-j if rev else j)


# ---------------------------------------------------------------------------
# Reshapes (F7 partial: i-RevNet, flatten, reshape)
# ---------------------------------------------------------------------------


def irevnet_downsampling(x, rev=False):
    """(B, C, H, W) <-> (B, 4C, H/2, W/2) checkerboard reshuffle; logdet 0
    (FrEIA reshapes.py:12-92)."""
    b = _batch(x)
    zj = jnp.zeros((b,), jnp.float32)
    if not rev:
        bb, c, h, w = x.shape
        y = x.reshape(bb, c, h // 2, 2, w // 2, 2)
        y = jnp.transpose(y, (0, 3, 5, 1, 2, 4)).reshape(bb, 4 * c,
                                                         h // 2, w // 2)
        return y, zj
    bb, c4, h, w = x.shape
    c = c4 // 4
    y = x.reshape(bb, 2, 2, c, h, w)
    y = jnp.transpose(y, (0, 3, 4, 1, 5, 2)).reshape(bb, c, 2 * h, 2 * w)
    return y, zj


def irevnet_upsampling(x, rev=False):
    return irevnet_downsampling(x, rev=not rev)


def flatten(x, rev=False, shape=None):
    zj = jnp.zeros((_batch(x),), jnp.float32)
    if rev:
        return x.reshape((x.shape[0],) + tuple(shape)), zj
    return x.reshape(x.shape[0], -1), zj


def reshape(x, target_shape, rev=False, input_shape=None):
    zj = jnp.zeros((_batch(x),), jnp.float32)
    shp = input_shape if rev else target_shape
    return x.reshape((x.shape[0],) + tuple(shp)), zj


# ---------------------------------------------------------------------------
# 2D <-> 3D layout changes (F12, reference INN_utils.py:18-124)
# ---------------------------------------------------------------------------


def turn_2d_to_3d(x, split_factor=3):
    """(B, C, H, W) -> (B, split, H, W, C/split) by channel groups."""
    b, c, h, w = x.shape
    if c % split_factor:
        raise ValueError(f"channels {c} not divisible by split_factor "
                         f"{split_factor}")
    parts = [jnp.transpose(p, (0, 2, 3, 1))[:, None]
             for p in jnp.split(x, split_factor, axis=1)]
    return jnp.concatenate(parts, axis=1)


def turn_3d_to_2d(x):
    """(B, S, H, W, C) -> (B, S*C, H, W) with depth-group-major channels."""
    if x.ndim == 4:
        return x
    b, s, h, w, c = x.shape
    parts = [jnp.transpose(x[:, i], (0, 3, 1, 2)) for i in range(s)]
    return jnp.concatenate(parts, axis=1)


def inv_2d_to_3d(x, rev=False, split_factor=3):
    zj = jnp.zeros((_batch(x),), jnp.float32)
    return ((turn_3d_to_2d(x) if rev else turn_2d_to_3d(x, split_factor)), zj)


def inv_3d_to_2d(x, rev=False, split_factor=3):
    zj = jnp.zeros((_batch(x),), jnp.float32)
    return ((turn_2d_to_3d(x, split_factor) if rev else turn_3d_to_2d(x)), zj)


# ---------------------------------------------------------------------------
# Orthogonal / Householder (F14)
# ---------------------------------------------------------------------------


def householder_matrix(vs: jax.Array) -> jax.Array:
    """Product of Householder reflections I - 2 v v^T / (v^T v)
    (FrEIA orthogonal.py:7-63)."""
    d = vs.shape[1]
    w = jnp.eye(d, dtype=vs.dtype)
    for i in range(vs.shape[0]):
        v = vs[i:i + 1].T
        w = w @ (jnp.eye(d, dtype=vs.dtype)
                 - 2.0 * (v @ v.T) / jnp.sum(v * v))
    return w


def init_householder_perm(key, dims: int, n_reflections: int = 1):
    return {"vs": 0.2 * jax.random.normal(key, (n_reflections, dims))}


def householder_perm(params, x, rev=False, fixed=False):
    w = householder_matrix(params["vs"].astype(jnp.float32)).astype(x.dtype)
    zj = jnp.zeros((_batch(x),), jnp.float32)   # orthogonal: logdet 0
    return (x @ (w.T if rev else w)), zj


def init_orthogonal_transform(key, dims: int):
    """Learned orthogonal matrix, initialized orthogonal; training should
    re-project to the Stiefel manifold periodically (orthogonal.py:80-231)."""
    a = jax.random.normal(key, (dims, dims))
    q, _ = jnp.linalg.qr(a)
    return {"w": q}


def orthogonal_transform(params, x, rev=False):
    w = params["w"].astype(x.dtype)
    zj = jnp.zeros((_batch(x),), jnp.float32)
    return (x @ (w.T if rev else w)), zj


def stiefel_project(params):
    """Re-orthogonalize the weight (the reference does this with a backward
    hook; functionally it's an explicit projection step)."""
    u, _, vt = jnp.linalg.svd(params["w"], full_matrices=False)
    return {"w": u @ vt}


# ---------------------------------------------------------------------------
# Invertible autoencoder layers (F15)
# ---------------------------------------------------------------------------


def inv_auto_act(params, x, rev=False):
    """Learned leaky-relu-style activation: slope alpha for x<0, 1/alpha...
    FrEIA InvAutoAct: y = alpha^sign(x) style elementwise scaling —
    implemented as y = where(x>=0, x*a, x/a) with a = exp(log_alpha)."""
    a = jnp.exp(params["log_alpha"]).astype(x.dtype)
    if rev:
        y = jnp.where(x >= 0, x / a, x * a)
    else:
        y = jnp.where(x >= 0, x * a, x / a)
    s = jnp.log(a) * jnp.where(x >= 0, 1.0, -1.0).astype(jnp.float32)
    j = jnp.sum(s.reshape(x.shape[0], -1), axis=1)
    return y, (-j if rev else j)


def init_inv_auto_act_two_sided(n_chans: int, init_pos: float = 2.0,
                                init_neg: float = 0.5):
    """Per-channel two-sided slopes, learned in log space
    (inv_auto_layers.py:29-53; exp(alpha_pos) == init_pos)."""
    return {
        "alpha_pos": jnp.full((n_chans,), float(np.log(init_pos)),
                              jnp.float32),
        "alpha_neg": jnp.full((n_chans,), float(np.log(init_neg)),
                              jnp.float32),
    }


def inv_auto_act_two_sided(params, x, rev=False):
    """Leaky-relu-like activation with separate learned positive/negative
    slopes per channel (inv_auto_layers.py:12-71):

      log_slope = a_pos + 0.5*(a_neg - a_pos)*(1 - sign(x));  y = x*exp(ls)

    The reverse pass negates log_slope; slopes are strictly positive so
    sign(y) == sign(x) and the same selector works in both directions.
    logdet = sum(log_slope) over non-batch dims (sign convention: -j rev).
    """
    shape = (1, -1) + (1,) * (x.ndim - 2)
    ap = params["alpha_pos"].reshape(shape)
    an = params["alpha_neg"].reshape(shape)
    ls = ap + 0.5 * (an - ap) * (1.0 - jnp.sign(x).astype(jnp.float32))
    if rev:
        ls = -ls
    y = x * jnp.exp(ls).astype(x.dtype)
    j = jnp.sum(ls.reshape(x.shape[0], -1), axis=1)
    return y, j


def init_inv_auto_fc(key, c_in: int, c_out: int | None = None):
    """W ~ N(0, 1/c_out) of shape (c_out, c_in), bias ~ N(0, 1)
    (inv_auto_layers.py:196-198)."""
    c_out = c_in if c_out is None else c_out
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.normal(kw, (c_out, c_in)) * np.sqrt(1.0 / c_out),
        "b": jax.random.normal(kb, (c_out,)),
    }


def inv_auto_fc(params, x, rev=False):
    """Fully-connected invertible-autoencoder layer (arXiv 1802.06869;
    inv_auto_layers.py:172-216): the reverse applies W^T rather than a true
    inverse, so fwd∘rev is only the identity once W converges to orthogonal.
    The log-det is intractable and reported as 0 exactly like the reference
    (which warns and returns 0.)."""
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)
    if rev:
        return (x - b) @ w, jnp.zeros((x.shape[0],), jnp.float32)
    return x @ w.T + b, jnp.zeros((x.shape[0],), jnp.float32)


def init_inv_auto_conv2d(key, c_in: int, c_out: int | None = None,
                         kernel_size: int = 3):
    c_out = c_in if c_out is None else c_out
    kw, kb = jax.random.split(key)
    fan = c_in * kernel_size * kernel_size
    lim = np.sqrt(1.0 / fan)        # torch Conv2d default U(-1/sqrt(fan), .)
    return {
        "w": jax.random.uniform(kw, (c_out, c_in, kernel_size, kernel_size),
                                minval=-lim, maxval=lim),
        "b": jax.random.normal(kb, (c_out,)),
    }


def inv_auto_conv2d(params, x, rev=False, padding: int | None = None):
    """Convolutional invertible-autoencoder layer (inv_auto_layers.py:218-272).
    Forward: conv2d(x, W) + b.  Reverse: conv_transpose2d(x - b, W) — the
    adjoint of the forward conv, expressed as a conv with the kernel flipped
    spatially, in/out channels swapped, and SAME-adjoint padding k-1-p.
    x: (B, C, H, W).  logdet reported as 0 (intractable; see inv_auto_fc)."""
    w = params["w"].astype(x.dtype)
    b = params["b"].astype(x.dtype)[None, :, None, None]
    k = w.shape[-1]
    p = k // 2 if padding is None else padding
    zero_j = jnp.zeros((x.shape[0],), jnp.float32)
    if not rev:
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(p, p)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y + b, zero_j
    wt = jnp.transpose(w, (1, 0, 2, 3))[:, :, ::-1, ::-1]
    y = jax.lax.conv_general_dilated(
        x - b, wt, (1, 1), [(k - 1 - p, k - 1 - p)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y, zero_j


def init_learned_elementwise_scaling(shape):
    return {"s": jnp.zeros(shape, jnp.float32)}


def learned_elementwise_scaling(params, x, rev=False):
    s = params["s"].astype(jnp.float32)
    j = jnp.broadcast_to(jnp.sum(s), (x.shape[0],))
    scale = jnp.exp(s).astype(x.dtype)
    if rev:
        return x / scale, -j
    return x * scale, j


# ---------------------------------------------------------------------------
# i-ResNet layer (F16): y = x + g(x), Lipschitz(g) < 1
# ---------------------------------------------------------------------------


def iresnet_forward(g: Callable, x, n_series: int = 8, key=None):
    """y = x + g(x) with Hutchinson power-series log-det estimate
    (invertible_resnet.py:89-234): logdet = sum_k (-1)^{k+1}/k tr(J_g^k),
    traces estimated with one Rademacher probe via vjp."""
    y = x + g(x)
    if key is None:
        return y, jnp.zeros((x.shape[0],), jnp.float32)
    v = jax.random.rademacher(key, x.shape, jnp.float32).astype(x.dtype)
    _, vjp = jax.vjp(g, x)
    w = v
    logdet = jnp.zeros((x.shape[0],), jnp.float32)
    for k in range(1, n_series + 1):
        (w,) = vjp(w)
        tr = jnp.sum((v * w).reshape(x.shape[0], -1).astype(jnp.float32),
                     axis=1)
        logdet = logdet + ((-1.0) ** (k + 1)) / k * tr
    return y, logdet


def iresnet_inverse(g: Callable, y, n_iter: int = 50):
    """Fixed-point inverse x_{n+1} = y - g(x_n)."""
    def body(_, x):
        return y - g(x)
    return jax.lax.fori_loop(0, n_iter, body, y)


# ---------------------------------------------------------------------------
# Gaussian mixture model head (F17)
# ---------------------------------------------------------------------------


def gmm_nll(z, mu, log_sigma, logit_w):
    """Negative log-likelihood of z (B, D) under a diagonal GMM
    (gaussian_mixture.py:7-174): components mu/log_sigma (K, D), weights
    softmax(logit_w) (K,)."""
    log_w = jax.nn.log_softmax(logit_w)
    z = z[:, None, :]
    comp = -0.5 * jnp.sum(((z - mu[None]) * jnp.exp(-log_sigma[None])) ** 2
                          + 2 * log_sigma[None]
                          + math.log(2 * math.pi), axis=-1)
    return -jax.scipy.special.logsumexp(comp + log_w[None], axis=1)


def gmm_sample(key, n, mu, log_sigma, logit_w):
    k1, k2 = jax.random.split(key)
    comp = jax.random.categorical(k1, logit_w, shape=(n,))
    eps = jax.random.normal(k2, (n, mu.shape[1]))
    return mu[comp] + eps * jnp.exp(log_sigma[comp])


# ---------------------------------------------------------------------------
# Sequential combinator (F3)
# ---------------------------------------------------------------------------


class SequenceINN:
    """Append-style sequential invertible net (FrEIA sequence_inn.py:10-99):
    ops are (apply, params) pairs with apply(params, x, rev) -> (y, logdet)."""

    def __init__(self, *ops):
        self.ops = list(ops)

    def append(self, apply_fn, params=None):
        self.ops.append((apply_fn, params))

    def __call__(self, x, rev=False):
        logdet = jnp.zeros((x.shape[0],), jnp.float32)
        seq = reversed(self.ops) if rev else self.ops
        for apply_fn, params in seq:
            if params is None:
                x, j = apply_fn(x, rev=rev)
            else:
                x, j = apply_fn(params, x, rev=rev)
            logdet = logdet + j
        return x, logdet
