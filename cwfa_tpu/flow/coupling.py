"""Affine coupling blocks with soft-clamped scales and exact log-dets.

Pure-function re-implementations of the reference coupling family
(FrEIA/modules/coupling_layers.py:8-500, all_in_one_block.py:13-271):

- ``cat_transform``      ConditionalAffineTransform (SPADE-style, the default
                         CWFA block, networks.py:296-297): whole-tensor affine
                         with (s, t) predicted from the condition only.
- ``two_sided_coupling`` NICE / RNVP / GLOW / GIN — channel-split two-sided
                         couplings parameterized by their subnets.
- ``one_sided_coupling`` AffineCouplingOneSided.
- ``all_in_one_block``   GLOW-style coupling + 1x1 permutation + global affine.

All blocks share the clamp mechanism s = clamp * f_clamp(s_raw), with f_clamp
in {ATAN: 0.636*atan, TANH, SIGMOID: 2*(sigmoid-0.5)}
(coupling_layers.py:50-60).  Scales/log-dets are computed in float32.

Subnets are passed as ``(apply_fn, params)`` pairs — the blocks themselves own
no parameters beyond their subnets, matching the functional design.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def clamp_fn(name: str) -> Callable[[jax.Array], jax.Array]:
    if name == "ATAN":
        return lambda u: 0.636 * jnp.arctan(u)
    if name == "TANH":
        return jnp.tanh
    if name == "SIGMOID":
        return lambda u: 2.0 * (jax.nn.sigmoid(u) - 0.5)
    raise ValueError(f"Unknown clamp activation {name!r}")


def _sum_per_sample(s: jax.Array) -> jax.Array:
    return jnp.sum(s.astype(jnp.float32), axis=tuple(range(1, s.ndim)))


def _affine(x, s, t, rev: bool):
    """y = exp(s)*x + t (fwd) / (x - t)*exp(-s) (rev), with per-sample logdet."""
    j = _sum_per_sample(s)
    if rev:
        return ((x - t) * jnp.exp(-s), -j)
    return (jnp.exp(s) * x + t, j)


# ---------------------------------------------------------------------------
# ConditionalAffineTransform (default CWFA block)
# ---------------------------------------------------------------------------


def cat_transform(subnet_apply, subnet_params, x, conds, rev=False,
                  clamp: float = 2.0, clamp_activation: str = "ATAN"):
    """Affine transform of the whole tensor from the condition only
    (coupling_layers.py:440-500). ``conds`` is a sequence of (B, Ci, H, W)
    arrays concatenated on channels; the subnet maps sum(Ci) -> 2*C."""
    cond = conds[0] if len(conds) == 1 else jnp.concatenate(conds, axis=1)
    a = subnet_apply(subnet_params, cond)
    c = x.shape[1]
    s_raw, t = a[:, :c], a[:, c:]
    s = clamp * clamp_fn(clamp_activation)(s_raw.astype(jnp.float32))
    s = s.astype(x.dtype)
    return _affine(x, s, t, rev)


# ---------------------------------------------------------------------------
# Two-sided couplings (NICE / RNVP / GLOW / GIN)
# ---------------------------------------------------------------------------


def two_sided_coupling(kind: str, subnets, x, conds=(), rev=False,
                       clamp: float = 2.0, clamp_activation: str = "ATAN"):
    """Channel-split coupling over x = [x1 | x2] (split1 = C//2,
    split2 = C - C//2, coupling_layers.py:40-41).

    kind: 'NICE' | 'RNVP' | 'GLOW' | 'GIN'
    subnets: dict of (apply, params) pairs —
       NICE:        {'F': s2->s1 residual, 'G': s1->s2 residual}
       RNVP:        {'s1','t1','s2','t2'}  (coupling_layers.py:192-195)
       GLOW / GIN:  {'subnet1': s1+cond -> 2*s2, 'subnet2': s2+cond -> 2*s1}

    Execution order matches _BaseCouplingBlock.forward
    (coupling_layers.py:62-87): fwd computes y1 from (x2, c), then y2 from
    (y1, c); rev inverts in the opposite order.
    """
    c = x.shape[1]
    l1 = c // 2
    x1, x2 = x[:, :l1], x[:, l1:]
    cat = (lambda u: jnp.concatenate([u, *conds], axis=1)) if conds else (lambda u: u)
    fcl = clamp_fn(clamp_activation)

    def coupling1(x1_, u2, rev_):
        # transforms the first half from the second half (+cond)
        if kind == "NICE":
            f = subnets["F"][0](subnets["F"][1], u2)
            zj = jnp.zeros((x.shape[0],), jnp.float32)
            return (x1_ - f, zj) if rev_ else (x1_ + f, zj)
        if kind == "RNVP":
            s2 = subnets["s2"][0](subnets["s2"][1], u2)
            t2 = subnets["t2"][0](subnets["t2"][1], u2)
        else:  # GLOW / GIN joint prediction
            a2 = subnets["subnet2"][0](subnets["subnet2"][1], u2)
            s2, t2 = a2[:, :l1], a2[:, l1:]
        s2 = clamp * fcl(s2.astype(jnp.float32))
        if kind == "GIN":  # volume preserving: zero-mean over channels
            s2 = s2 - jnp.mean(s2, axis=1, keepdims=True)
        s2 = s2.astype(x.dtype)
        y, j = _affine(x1_, s2, t2, rev_)
        if kind == "GIN":
            j = jnp.zeros_like(j)
        return y, j

    def coupling2(x2_, u1, rev_):
        if kind == "NICE":
            g = subnets["G"][0](subnets["G"][1], u1)
            zj = jnp.zeros((x.shape[0],), jnp.float32)
            return (x2_ - g, zj) if rev_ else (x2_ + g, zj)
        if kind == "RNVP":
            s1 = subnets["s1"][0](subnets["s1"][1], u1)
            t1 = subnets["t1"][0](subnets["t1"][1], u1)
        else:
            a1 = subnets["subnet1"][0](subnets["subnet1"][1], u1)
            s1, t1 = a1[:, : c - l1], a1[:, c - l1:]
        s1 = clamp * fcl(s1.astype(jnp.float32))
        if kind == "GIN":
            s1 = s1 - jnp.mean(s1, axis=1, keepdims=True)
        s1 = s1.astype(x.dtype)
        y, j = _affine(x2_, s1, t1, rev_)
        if kind == "GIN":
            j = jnp.zeros_like(j)
        return y, j

    if not rev:
        y1, j1 = coupling1(x1, cat(x2), False)
        y2, j2 = coupling2(x2, cat(y1), False)
    else:
        y2, j2 = coupling2(x2, cat(x1), True)
        y1, j1 = coupling1(x1, cat(y2), True)
    return jnp.concatenate([y1, y2], axis=1), j1 + j2


def one_sided_coupling(subnet, x, conds=(), rev=False, clamp: float = 2.0,
                       clamp_activation: str = "ATAN"):
    """AffineCouplingOneSided (coupling_layers.py:384-437)."""
    c = x.shape[1]
    l1 = c // 2
    l2 = c - l1
    x1, x2 = x[:, :l1], x[:, l1:]
    u1 = jnp.concatenate([x1, *conds], axis=1) if conds else x1
    a = subnet[0](subnet[1], u1)
    s_raw, t = a[:, :l2], a[:, l2:]
    s = clamp * clamp_fn(clamp_activation)(s_raw.astype(jnp.float32))
    s = s.astype(x.dtype)
    y2, j = _affine(x2, s, t, rev)
    return jnp.concatenate([x1, y2], axis=1), j


# ---------------------------------------------------------------------------
# AllInOneBlock (coupling + 1x1 permutation + ActNorm-style global affine)
# ---------------------------------------------------------------------------


def init_all_in_one_block(key, channels: int, global_affine_init: float = 1.0,
                          global_affine_type: str = "SOFTPLUS",
                          permute_soft: bool = False,
                          rng: np.random.RandomState | None = None):
    """Parameters + fixed permutation matrix for an AllInOneBlock
    (all_in_one_block.py:46-168). Subnet params live with the caller."""
    rng = rng or np.random
    if global_affine_type == "SIGMOID":
        gs = 2.0 - math.log(10.0 / global_affine_init - 1.0)
    elif global_affine_type == "SOFTPLUS":
        gs = 2.0 * math.log(math.exp(0.5 * 10.0 * global_affine_init) - 1.0)
    elif global_affine_type == "EXP":
        gs = math.log(global_affine_init)
    else:
        raise ValueError(global_affine_type)
    if permute_soft:
        from scipy.stats import special_ortho_group
        w = special_ortho_group.rvs(channels, random_state=rng)
    else:
        w = np.zeros((channels, channels), np.float32)
        for i, j in enumerate(rng.permutation(channels)):
            w[i, j] = 1.0
    return {
        "global_scale": jnp.full((1, channels, 1, 1), float(gs), jnp.float32),
        "global_offset": jnp.zeros((1, channels, 1, 1), jnp.float32),
        "w_perm": jnp.asarray(w, jnp.float32),        # non-trainable
    }


def _global_scale_activation(kind: str, a):
    if kind == "SIGMOID":
        return 10.0 * jax.nn.sigmoid(a - 2.0)
    if kind == "SOFTPLUS":
        return 0.1 * (jax.nn.softplus(0.5 * a) / 0.5)
    return jnp.exp(a)


def all_in_one_block(params, subnet, x, conds=(), rev=False,
                     clamp: float = 2.0, gin_block: bool = False,
                     global_affine_type: str = "SOFTPLUS"):
    """AllInOneBlock.forward (all_in_one_block.py:229-271): for fwd,
    split -> affine(x2 | subnet(x1, c)) -> concat -> global affine -> 1x1 perm.
    """
    c = x.shape[1]
    l1 = c - c // 2  # split_len1 (note: reverse of two-sided couplings)
    w = params["w_perm"]

    def permute(u, rev_):
        scale = _global_scale_activation(global_affine_type,
                                         params["global_scale"].astype(jnp.float32))
        perm_jac = jnp.sum(jnp.log(scale))
        if gin_block:
            scale, perm_jac = 1.0, 0.0
        if rev_:
            out = jnp.einsum("oc,bchw->bohw", w.T, u.astype(jnp.float32))
            out = (out - params["global_offset"]) / scale
        else:
            out = u.astype(jnp.float32) * scale + params["global_offset"]
            out = jnp.einsum("oc,bchw->bohw", w, out)
        return out.astype(x.dtype), perm_jac

    def affine(x2, a, rev_):
        a = a.astype(jnp.float32) * 0.1  # stability scaling (line 214)
        ch = x2.shape[1]
        sj = clamp * jnp.tanh(a[:, :ch])
        if gin_block:
            sj = sj - jnp.mean(sj, axis=tuple(range(1, sj.ndim)), keepdims=True)
        t = a[:, ch:].astype(x.dtype)
        s = sj.astype(x.dtype)
        if rev_:
            return (x2 - t) * jnp.exp(-s), -_sum_per_sample(sj)
        return x2 * jnp.exp(s) + t, _sum_per_sample(sj)

    if rev:
        xp, gjac = permute(x, True)
    else:
        xp, gjac = x, None
    x1, x2 = xp[:, :l1], xp[:, l1:]
    u1 = jnp.concatenate([x1, *conds], axis=1) if conds else x1
    a1 = subnet[0](subnet[1], u1)
    y2, j2 = affine(x2, a1, rev)
    out = jnp.concatenate([x1, y2], axis=1)
    if not rev:
        out, gjac = permute(out, False)
    n_pixels = float(np.prod(x.shape[2:]))
    sign = -1.0 if rev else 1.0
    logdet = j2 + sign * n_pixels * gjac
    return out, logdet
