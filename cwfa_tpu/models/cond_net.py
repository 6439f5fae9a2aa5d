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

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

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


@lru_cache(maxsize=32)
def _depth_band(d: int) -> np.ndarray:
    """band[c, c', dc] = 1 iff c' == c + dc - 1: the SAME-padded 3-tap depth
    neighborhood as a (D, D, 3) selection tensor."""
    band = np.zeros((d, d, 3), np.float32)
    for c in range(d):
        for dc in range(3):
            cc = c + dc - 1
            if 0 <= cc < d:
                band[c, cc, dc] = 1.0
    return band


def _conv3d_pair_banded(params, out, act, drop_rate, rng):
    """The cond net's Conv3d(1->K) -> PReLU -> Dropout3d -> Conv3d(K->1)
    stack (reference networks.py:221-225), executed as two DENSE 2-D convs
    whose channel-mixing matrices carry the depth band structure.

    Rationale (TPU): a 3-D conv with 1 input channel has a 27-element
    contraction that XLA lowers terribly on the MXU (~1.4 TFLOP/s measured);
    baking the tri-diagonal depth coupling into a dense (D -> K*D -> D)
    conv2d pair trades 4x nominal FLOPs for full MXU tiling (~8x faster
    end-to-end). Numerics are identical (validated against the direct conv3d
    path in tests/test_cond_net.py).
    """
    d = out.shape[1]
    wa, ba = params["c3a"]["w"], params["c3a"].get("b")   # (K,1,3,3,3)
    wb, bb = params["c3b"]["w"], params["c3b"].get("b")   # (1,K,3,3,3)
    k = wa.shape[0]
    band = jnp.asarray(_depth_band(d))
    # kernel dims of the NCDHW conv act on (H, W, C): wa[o, 0, kh, kw, dc]
    w2a = jnp.einsum("oxyd,cCd->ocCxy", wa[:, 0], band)   # (K, D, D, 3, 3)
    w2b = jnp.einsum("oxyd,cCd->coCxy", wb[0], band)      # (D, K, D, 3, 3)

    # chunk the K feature groups: the (B, K*D, H, W) intermediate is ~3 GB at
    # batch 4 / D=48; partial sums over o-chunks are exact (conv_b is linear
    # in its inputs) and bound the live intermediate
    b_sz = out.shape[0]
    hw = out.shape[2] * out.shape[3]
    budget = 900 * 1024 * 1024 // max(out.dtype.itemsize, 2)
    chunk = max(min(k, budget // max(b_sz * d * hw, 1)), 1)
    mask = None
    if drop_rate and rng is not None:
        # Dropout3d drops whole (b, o) feature volumes
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(rng, keep, (b_sz, k))
    z = None
    for o0 in range(0, k, chunk):
        o1 = min(o0 + chunk, k)
        wa_c = w2a[o0:o1].reshape((o1 - o0) * d, d, 3, 3)
        y = cnn.conv2d({"w": wa_c}, out)
        if ba is not None:
            y = y + jnp.repeat(ba[o0:o1], d).astype(y.dtype)[None, :, None,
                                                             None]
        y = act(y)
        if mask is not None:
            m = jnp.repeat(mask[:, o0:o1], d, axis=1)[:, :, None, None]
            y = jnp.where(m, y / (1.0 - drop_rate), 0.0).astype(y.dtype)
        wb_c = w2b[:, o0:o1].reshape(d, (o1 - o0) * d, 3, 3)
        zc = cnn.conv2d({"w": wb_c}, y)
        z = zc if z is None else z + zc
    if bb is not None:
        z = z + bb.astype(z.dtype)[None, :, None, None]
    return z


def _conv_a_depthbatch(params, out, act):
    """conv_a + bias + PReLU of the depthbatch form: (B*D, K, H, W)."""
    b, d, h, w = out.shape
    wa, ba = params["c3a"]["w"], params["c3a"].get("b")
    w_a = jnp.transpose(wa[:, 0], (0, 3, 1, 2))
    xp = jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0)))
    x3 = jnp.stack([xp[:, 0:d], xp[:, 1:d + 1], xp[:, 2:d + 2]], axis=2)
    y = cnn.conv2d({"w": w_a}, x3.reshape(b * d, 3, h, w))
    if ba is not None:
        y = y + ba.astype(y.dtype)[None, :, None, None]
    return act(y)


def calibrate_cond3d(params, x_cond, act):
    """Per-feature absmax scales (K,) of the post-PReLU conv_a output, for
    the int8 y-intermediate (``_conv3d_pair_depthbatch_int8``).
    x_cond: the 2-D-stack output (B, D, H, W) on calibration views."""
    y = _conv_a_depthbatch(params, x_cond.astype(jnp.float32), act)
    amax = jnp.max(jnp.abs(y), axis=(0, 2, 3))
    return jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)


def quantize_cond3d(params, scales):
    """int8 pack for conv_b with the per-feature y scales folded in.

    Returns {"wbq": (3dc, K, 3, 3) int8, "sb": (3,) f32 dequant scales,
    "inv_s": (K,) f32 y-quantization reciprocals}."""
    wb = params["c3b"]["w"]                       # (1, K, 3, 3, 3)
    w_b = jnp.transpose(wb[0], (3, 0, 1, 2)).astype(jnp.float32)
    w_b = w_b * scales[None, :, None, None]       # fold y scale per K
    amax = jnp.max(jnp.abs(w_b), axis=(1, 2, 3))
    sb = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    wbq = jnp.clip(jnp.round(w_b / sb[:, None, None, None]),
                   -127, 127).astype(jnp.int8)
    return {"wbq": wbq, "sb": sb,
            "inv_s": (1.0 / scales).astype(jnp.float32)}


def _conv3d_pair_depthbatch_int8(params, out, act, q):
    """Inference-only depthbatch pair with the (B*D, K, H, W) y-intermediate
    carried as int8: the pair is HBM-bound (y is ~32x the input bytes, ~3
    GB/frame at flagship across the four steps), so halving y's bytes is
    the lever — the MXU rate at these tiny channel counts is unchanged in
    either precision (docs/PERFORMANCE.md round-3).  Per-feature static
    calibration; tolerance-guarded in tests/test_cond_net.py."""
    b, d, h, w = out.shape
    y = _conv_a_depthbatch(params, out, act)
    yq = jnp.clip(jnp.round(y.astype(jnp.float32)
                            * q["inv_s"][None, :, None, None]),
                  -127, 127).astype(jnp.int8)
    v = jax.lax.conv_general_dilated(
        yq, q["wbq"], (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.int32)
    v = (v.astype(jnp.float32) * q["sb"][None, :, None, None]
         ).astype(out.dtype).reshape(b, d, 3, h, w)
    return _band_add(v, params["c3b"].get("b"))


def _band_add(v, bb):
    """The 3-tap depth band-add epilogue shared by every conv_b form:
    z[c] = v[c-1, dc=0] + v[c, dc=1] + v[c+1, dc=2] (SAME-padded band),
    plus the conv_b bias.  v: (B, D, 3, H, W).  Numerics-critical — one
    definition so the band convention can never drift between the
    depthbatch / int8 / depthtile paths."""
    z = v[:, :, 1]
    z = z.at[:, 1:].add(v[:, :-1, 0])
    z = z.at[:, :-1].add(v[:, 1:, 2])
    if bb is not None:
        z = z + bb.astype(z.dtype)[None, :, None, None]
    return z


def _conv3d_pair_depthbatch(params, out, act, drop_rate, rng):
    """The Conv3d(1->K)->PReLU->Dropout3d->Conv3d(K->1) pair with the DEPTH
    axis folded into the batch — the direct (minimum-FLOP) contraction as two
    2-D convs plus a 3-tap shifted add:

      conv_a: x3 (B*D, 3, H, W)  @ (K, 3, 3, 3)   [3 = depth window]
      conv_b: y  (B*D, K, H, W)  @ (3, K, 3, 3)   -> v, then
              z[c] = v[c-1, dc=0] + v[c, dc=1] + v[c+1, dc=2]

    vs the banded-dense form this does D/3x fewer MACs (16x at D=48) and
    measured 1.8x faster end-to-end at the step-0 shape on v5e; numerics are
    identical (tests/test_cond_net.py). The banded path stays for shapes
    where D is small (its full-tile N=K*D wins when the band is short)."""
    b, d, h, w = out.shape
    wb, bb = params["c3b"]["w"], params["c3b"].get("b")   # (1,K,kh,kw,dc)
    k = params["c3a"]["w"].shape[0]
    y = _conv_a_depthbatch(params, out, act)
    if drop_rate and rng is not None:
        # Dropout3d drops whole (b, o) feature volumes across all depths
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(rng, keep, (b, k))
        m = mask[:, None, :, None, None]
        y = jnp.where(jnp.broadcast_to(m, (b, d, k, h, w)).reshape(y.shape),
                      y / keep, 0.0).astype(y.dtype)
    w_b = jnp.transpose(wb[0], (3, 0, 1, 2))              # (3dc, K, 3, 3)
    v = cnn.conv2d({"w": w_b}, y).reshape(b, d, 3, h, w)
    return _band_add(v, bb)


@lru_cache(maxsize=32)
def _tile_band(t: int) -> np.ndarray:
    """band[tt, s, dc] = 1 iff s == tt + dc: output tile position tt reads
    input window slice s = tt + dc (window starts at depth d0 - 1)."""
    band = np.zeros((t, t + 2, 3), np.float32)
    for tt in range(t):
        for dc in range(3):
            band[tt, tt + dc, dc] = 1.0
    return band


def _conv3d_pair_depthtile(params, out, act, drop_rate, rng, t: int = 4):
    """depthbatch's conv_a with T output depths DENSELY tiled into one
    conv: input (B*D/T, T+2, H, W) [overlapping depth windows as channels],
    kernel (T*K, T+2, 3, 3).  At T=4/K=32 this is a 6->128-channel conv —
    full MXU tiles — versus depthbatch's 3->32 (5% tile use) at 2x the
    nominal MACs; numerics identical (the extra kernel entries are zero).
    conv_b (the irreducibly N-starved half) stays in depthbatch form."""
    b, d, h, w = out.shape
    assert d % t == 0, (d, t)
    wa, ba = params["c3a"]["w"], params["c3a"].get("b")   # (K,1,kh,kw,dc)
    k = wa.shape[0]
    band = jnp.asarray(_tile_band(t))
    # (K, kh, kw, dc) x (T, T+2, dc) -> (T, K, T+2, kh, kw)
    w_t = jnp.einsum("oxyd,tsd->tosxy", wa[:, 0], band) \
        .reshape(t * k, t + 2, 3, 3)
    xp = jnp.pad(out, ((0, 0), (1, 1), (0, 0), (0, 0)))
    # overlapping windows: window i covers padded depths [i*t, i*t + t + 2)
    wins = jnp.stack([xp[:, j:j + d - t + 1:t] for j in range(t + 2)],
                     axis=2)                               # (B, D/T, T+2, H, W)
    y = cnn.conv2d({"w": w_t}, wins.reshape(b * (d // t), t + 2, h, w))
    y = y.reshape(b * d, k, h, w)
    if ba is not None:
        y = y + ba.astype(y.dtype)[None, :, None, None]
    y = act(y)
    if drop_rate and rng is not None:
        keep = 1.0 - drop_rate
        mask = jax.random.bernoulli(rng, keep, (b, k))
        m = mask[:, None, :, None, None]
        y = jnp.where(jnp.broadcast_to(m, (b, d, k, h, w)).reshape(y.shape),
                      y / keep, 0.0).astype(y.dtype)
    wb, bb = params["c3b"]["w"], params["c3b"].get("b")
    w_b = jnp.transpose(wb[0], (3, 0, 1, 2))
    v = cnn.conv2d({"w": w_b}, y).reshape(b, d, 3, h, w)
    return _band_add(v, bb)


def _conv3d_pair_direct(params, out, act, drop_rate, rng):
    """Reference-layout path: (B, C, H, W) -> (B, 1, H, W, C) -> Conv3d x2."""
    v = jnp.transpose(out, (0, 2, 3, 1))[:, None]
    v = act(cnn.conv3d(params["c3a"], v))
    v = cnn.dropout3d(v, drop_rate, rng)
    v = cnn.conv3d(params["c3b"], v)
    return jnp.transpose(v[:, 0], (0, 3, 1, 2))


def _conv3d_pair(params, out, act, drop, rng, impl: str = "auto"):
    """Pick the 3-D pair formulation: the banded-dense form's D/3x FLOP
    blowup loses to the depth-in-batch direct form once D is large (measured
    crossover ~D=24 on v5e; all are numerics-identical)."""
    import os
    if os.environ.get("CWFA_COND_PAIR_DTYPE") == "bf16" \
            and out.dtype == jnp.float32:
        # A/B rig: run the whole HBM-bound pair (incl. the ~32x y
        # intermediate) in bf16 storage — the int8 y experiment was
        # requant-neutral; this tests the cast-free half-byte variant.
        z = _conv3d_pair(params, out.astype(jnp.bfloat16), act, drop, rng,
                         impl)
        return z.astype(jnp.float32)
    if impl == "auto":
        # Round-2 re-measurement (scripts/profile_cond.py, batch 8): the
        # depth-in-batch form wins at EVERY step depth (D=48: 4.1 vs
        # banded's blowup; D=12: 1.50 vs 2.98; D=6: 1.39 vs 1.75 ms/frame),
        # and depthtile's dense 6->128 conv_a measured 3.3x slower than
        # depthbatch (this XLA build lowers small-C_in convs through a
        # non-im2col path). Both stay available but are never auto-picked.
        impl = "depthbatch"
    if impl == "banded":
        return _conv3d_pair_banded(params, out, act, drop, rng)
    if impl == "depthbatch":
        return _conv3d_pair_depthbatch(params, out, act, drop, rng)
    if impl == "depthtile":
        return _conv3d_pair_depthtile(params, out, act, drop, rng)
    if impl == "pallas_fused":
        # the round-4 fused VMEM kernel — measured 3.3-5.4x SLOWER than
        # depthbatch on this platform (docs/CEILING.md; kept switchable
        # like ops/qtower + ops/btower for hardware where the MXU fill /
        # VPU trade-offs differ).  Inference-only; depth % 4 required.
        if drop and rng is not None:
            raise ValueError("pallas_fused cond pair is inference-only "
                             "(no Dropout3d path)")
        from cwfa_tpu.ops.cond_pair import cond_pair_fused
        return cond_pair_fused(
            out, {"c3a": params["c3a"], "c3b": params["c3b"],
                  "prelu": params["prelu"]},
            out_dtype=out.dtype,
            interpret=jax.default_backend() != "tpu")
    return _conv3d_pair_direct(params, out, act, drop, rng)


def cond_network(params, x, *, train: bool = False, rng=None,
                 dropout3d_rate: float = 0.5, conv3d_impl: str = "auto"):
    """x: (B, 29, H, W) -> (B, c_out, H, W)."""
    act = lambda u: cnn.prelu(params["prelu"], u)
    out = act(cnn.conv2d(params["conv1"], x))
    out = cnn.conv2d(params["conv2"], out)
    residual = cnn.conv2d(params["down"], x)
    out = act(out + residual)

    drop = dropout3d_rate if train else 0.0
    return _conv3d_pair(params, out, act, drop, rng, conv3d_impl)


def _block_diag_w(ws):
    """Block-diagonal OIHW kernel from a list of kernels."""
    o_tot = sum(w.shape[0] for w in ws)
    i_tot = sum(w.shape[1] for w in ws)
    kh, kw = ws[0].shape[2:]
    out = jnp.zeros((o_tot, i_tot, kh, kw), ws[0].dtype)
    o0 = i0 = 0
    for w in ws:
        out = out.at[o0:o0 + w.shape[0], i0:i0 + w.shape[1]].set(w)
        o0 += w.shape[0]
        i0 += w.shape[1]
    return out


def cond_networks_batched(params_list, x, cond_q=None):
    """Run ALL per-step condition networks on the same views in one set of
    wide convolutions (inference path).

    The four cond nets take identical input; their 2-D convs have tiny
    output-channel counts (48/24/12/6) that waste most of an MXU tile run
    separately. Stacking conv1/down on the shared input and block-diagonalizing
    conv2 yields full tiles with identical numerics (validated in
    tests/test_cond_net.py). The per-step PReLU and banded 3-D convs stay
    separate (different alphas / depths).

    Returns [out_k for each params in params_list].

    cond_q: optional per-step int8 y-packs (``quantize_cond_networks``) —
    routes each 3-D pair through the int8-intermediate path.
    """
    outs2d = cond_networks_2d(params_list, x)
    outs = []
    for i, p in enumerate(params_list):
        act = lambda u, pp=p: cnn.prelu(pp["prelu"], u)
        o = outs2d[i]
        if cond_q is not None and cond_q[i] is not None:
            outs.append(_conv3d_pair_depthbatch_int8(p, o, act, cond_q[i]))
        else:
            outs.append(_conv3d_pair(p, o, act, 0.0, None))
    return outs


def quantize_cond_networks(params_list, x_sample):
    """Build the per-step int8 y-packs for ``cond_networks_batched``:
    runs the 2-D stacks on sample views, calibrates each step's conv_a
    features, folds scales into int8 conv_b weights."""
    outs2d = cond_networks_2d(params_list, x_sample.astype(jnp.float32))
    packs = []
    for p, o in zip(params_list, outs2d):
        act = lambda u, pp=p: cnn.prelu(pp["prelu"], u)
        scales = calibrate_cond3d(p, o, act)
        packs.append(quantize_cond3d(p, scales))
    return packs


def cond_networks_2d(params_list, x):
    """The batched 2-D stack only (conv1/conv2/down + PReLUs), shared by
    ``cond_networks_batched`` and calibration."""
    c_outs = [p["conv1"]["w"].shape[0] for p in params_list]
    w1 = jnp.concatenate([p["conv1"]["w"] for p in params_list], 0)
    b1 = jnp.concatenate([p["conv1"]["b"] for p in params_list], 0)
    wd = jnp.concatenate([p["down"]["w"] for p in params_list], 0)
    bd = jnp.concatenate([p["down"]["b"] for p in params_list], 0)
    w2 = _block_diag_w([p["conv2"]["w"] for p in params_list])
    b2 = jnp.concatenate([p["conv2"]["b"] for p in params_list], 0)
    n1 = w1.shape[0]
    y1d = cnn.conv2d({"w": jnp.concatenate([w1, wd], 0),
                      "b": jnp.concatenate([b1, bd], 0)}, x)
    y1, res = y1d[:, :n1], y1d[:, n1:]
    segs = np.cumsum([0] + c_outs)
    y1 = jnp.concatenate(
        [cnn.prelu(p["prelu"], y1[:, segs[i]:segs[i + 1]])
         for i, p in enumerate(params_list)], axis=1)
    y2 = cnn.conv2d({"w": w2, "b": b2}, y1)
    return [cnn.prelu(p["prelu"], y2[:, segs[i]:segs[i + 1]]
                      + res[:, segs[i]:segs[i + 1]])
            for i, p in enumerate(params_list)]


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
