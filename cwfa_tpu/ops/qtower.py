"""Fused int8 wavelet-flow tower kernel (Pallas TPU).

The CAT coupling blocks' (s, t) subnet towers dominate inference FLOPs
(reference networks.py:586-706 run per block inside FrEIA's graph
interpreter; here they are paired into 128-wide block-diagonal towers, see
models/cwf._paired_tower).  Measured on v5e (scripts/bench_int8_micro*.py):

- N=128 GEMMs streamed through HBM are pipeline-limited at ~67 (bf16) /
  ~87 (int8) TF/s; XLA's end-to-end tower path lands at ~81 TF/s.
- The SAME chained dots on VMEM-resident data run at ~135 TF/s in int8.

So this kernel fuses one WHOLE paired tower — all 8 convs — into a single
Pallas program: activations never leave VMEM, 3x3 convs are 9 accumulated
(M,128)x(128,128) int8 dots, residuals ride a bf16 canvas, and the only HBM
traffic is the int8 input views tile and the bf16 (s_raw|t) output tile.

Quantization scheme (per paired tower):
- activations: symmetric PER-CHANNEL int8 with STATIC scales calibrated by
  running the f32 tower on sample conditions (``pair_tower_calibrate``);
  the per-input-channel scale folds into the weight matrix before weight
  quantization, so the GEMM dequant stays a per-output-channel multiply;
- weights (after folding): symmetric per-output-channel int8;
- all accumulation exact int32 on the MXU; epilogues (dequant, bias, ELU,
  requant) in f32 on the VPU.

Tower structure (reference networks.py:586-706, as packed by
models/cwf._paired_tower):

    r1 = b1(x)                       1x1, Cin -> C
    r2 = b2b(elu(b2a(r1))) + r1      3x3 then 1x1 residual blocks; the
    e2 = elu(r2)                     residual carried forward is the
    r4 = b4b(elu(b4a(e2))) + e2      POST-elu tensor (flow/subnets._tower)
    e4 = elu(r4)
    r6 = b6b(elu(b6a(e4))) + e4
    out = b7(elu(r6))                3x3, C -> Nout

SAME-padding semantics: the caller pre-pads the input by 4 (the total 3x3
halo) with zeros; after every in-kernel quantization the outside-image
border ring is re-zeroed (bias/ELU would otherwise pollute the zero pad).

The ``quantized_pair_tower_reference`` function is the jnp oracle (exact
same integer arithmetic via XLA int8 convolutions) used by the tests and by
non-TPU backends.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conv-input sites, in execution order; row index into the (8, C)
# per-channel activation-scale matrix
SITES = ("x", "r1", "e2a", "e2", "e4a", "e4", "e6a", "e6")


# ---------------------------------------------------------------------------
# Weight packing + calibration (host side, f32)
# ---------------------------------------------------------------------------


def _quant_w(w, s_in):
    """OIHW f32 -> (int8 same shape, (O,) f32 scale). Symmetric per-out-ch,
    with the input site's per-channel activation scale s_in (I,) folded in:
    the GEMM then computes sum_i round(x_i/s_i) * round(W_oi*s_i/sw_o), so
    dequantization is a single per-output-channel multiply by sw_o."""
    w = w * s_in[None, :, None, None]
    amax = jnp.max(jnp.abs(w), axis=(1, 2, 3))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale[:, None, None, None]), -127, 127)
    return q.astype(jnp.int8), scale


def _pack3x3(wq):
    """(O, I, 3, 3) int8 -> (9, I, O) for tap-indexed kernel dots
    (tap = dy*3 + dx)."""
    return jnp.transpose(wq, (2, 3, 1, 0)).reshape(9, wq.shape[1],
                                                   wq.shape[0])


def _pack1x1(wq):
    """(O, I, 1, 1) int8 -> (I, O)."""
    return jnp.transpose(wq[:, :, 0, 0], (1, 0))


# which SITES row feeds each conv, in kernel execution order
_CONV_SITE = {"b1": 0, "b2a": 1, "b2b": 2, "b4a": 3, "b4b": 4,
              "b6a": 5, "b6b": 6, "b7": 7}


def quantize_pair_tower(paired_params, act_scales):
    """Pack one PAIRED tower's params (the dict produced by
    models/cwf.pair_tower_params, f32 OIHW convs b1..b7) into the kernel's
    int8 weight set, folding the per-channel activation scales
    (``pair_tower_calibrate`` output, (8, C) with row 0 = input scales
    padded to C) into the weights.

    Returns a dict of arrays: w1 (Cin, C) i8, w{2,4,6}a (9, C, C) i8,
    w{2,4,6}b (C, C) i8, w7 (9, C, Nout) i8, sw (7, C) f32 dequant scales
    for b1..b6b, sw7 (Nout,) f32, biases b (7, C) f32 + b7 (Nout,) f32.
    """
    p = paired_params
    names3 = ("b2a", "b4a", "b6a")
    names1 = ("b2b", "b4b", "b6b")
    c = p["b2a"]["w"].shape[0]
    cin = p["b1"]["w"].shape[1]
    out = {}
    sws, bs = [], []
    q, s = _quant_w(p["b1"]["w"], act_scales[0, :cin])
    w1 = _pack1x1(q)                              # (Cin, C)
    # pad the contraction dim to the 128-lane int8 tile (quantize_input pads
    # the activations to match); zero rows are exact no-ops in the dot
    if w1.shape[0] % 128:
        w1 = jnp.pad(w1, ((0, 128 - w1.shape[0] % 128), (0, 0)))
    out["w1"] = w1
    sws.append(s)
    bs.append(p["b1"].get("b", jnp.zeros((c,))))
    for n3, n1 in zip(names3, names1):
        q, s = _quant_w(p[n3]["w"], act_scales[_CONV_SITE[n3]])
        out["w" + n3[1:]] = _pack3x3(q)
        sws.append(s)
        bs.append(p[n3].get("b", jnp.zeros((c,))))
        q, s = _quant_w(p[n1]["w"], act_scales[_CONV_SITE[n1]])
        out["w" + n1[1:]] = _pack1x1(q)
        sws.append(s)
        bs.append(p[n1].get("b", jnp.zeros((c,))))
    q, s = _quant_w(p["b7"]["w"], act_scales[7])
    out["w7"] = _pack3x3(q)
    out["sw7"] = s.astype(jnp.float32)
    nout = p["b7"]["w"].shape[0]
    out["bias7"] = p["b7"].get("b", jnp.zeros((nout,))).astype(jnp.float32)
    out["sw"] = jnp.stack([x.astype(jnp.float32) for x in sws])   # (7, C)
    out["bias"] = jnp.stack([x.astype(jnp.float32) for x in bs])  # (7, C)
    return out


def _f32_tower_trace(p, x):
    """f32 paired-tower forward returning every conv-input tensor
    (pre-quantization sites) + the output. x: (B, Cin, H, W)."""
    conv = lambda w, b, v, pad: (
        jax.lax.conv_general_dilated(
            v, w, (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        + (b[None, :, None, None] if b is not None else 0.0))
    g = lambda name, v: conv(p[name]["w"].astype(jnp.float32),
                             None if p[name].get("b") is None else
                             p[name]["b"].astype(jnp.float32),
                             v, 1 if p[name]["w"].shape[-1] == 3 else 0)
    elu = jax.nn.elu
    sites = {"x": x}
    r1 = g("b1", x)
    sites["r1"] = r1
    e2a = elu(g("b2a", r1))
    sites["e2a"] = e2a
    r2 = g("b2b", e2a) + r1
    e2 = elu(r2)
    sites["e2"] = e2
    e4a = elu(g("b4a", e2))
    sites["e4a"] = e4a
    r4 = g("b4b", e4a) + e2
    e4 = elu(r4)
    sites["e4"] = e4
    e6a = elu(g("b6a", e4))
    sites["e6a"] = e6a
    r6 = g("b6b", e6a) + e4
    e6 = elu(r6)
    sites["e6"] = e6
    out = g("b7", e6)
    return sites, out


def pair_tower_calibrate(paired_params, x, margin: float = 1.0):
    """Static PER-CHANNEL activation scales for the 8 conv-input sites,
    from the f32 tower on calibration conditions x (B, Cin, H, W).

    Returns (8, C) f32 in SITES order: absmax/127 per channel.  Row 0 (the
    Cin-channel input site) is padded to C with 1.0."""
    sites, _ = _f32_tower_trace(paired_params, x.astype(jnp.float32))
    c = sites["r1"].shape[1]
    rows = []
    for name in SITES:
        amax = jnp.max(jnp.abs(sites[name]), axis=(0, 2, 3)) * margin
        row = jnp.where(amax > 0, amax / 127.0, 1.0)
        if row.shape[0] < c:
            row = jnp.pad(row, (0, c - row.shape[0]), constant_values=1.0)
        rows.append(row)
    return jnp.stack(rows).astype(jnp.float32)


# ---------------------------------------------------------------------------
# jnp oracle (exact integer arithmetic via XLA int8 convs)
# ---------------------------------------------------------------------------


def _q(v, s_row):
    """Per-channel symmetric int8 quantization, NCHW.

    Multiplies by the precomputed f32 reciprocal — the SAME rounding input
    the kernel and ``quantize_input`` use; dividing by the scale instead can
    differ by 1 ulp at a round() boundary and flip an int8 level."""
    inv = (1.0 / s_row[:v.shape[1]]).astype(jnp.float32)
    return jnp.clip(jnp.round(v * inv[None, :, None, None]),
                    -127, 127).astype(jnp.int8)


def quantized_pair_tower_reference(qw, scales, xq):
    """Oracle: the same quantized math as the kernel, in NCHW jnp.

    xq: (B, Cin, H, W) int8 (already quantized per-channel with
    scales[0, :Cin]).  Returns (B, Nout, H, W) f32.
    """
    s = scales

    def conv3(q, w9, pad=1):
        # (9, I, O) -> OIHW
        o = w9.shape[-1]
        w = jnp.transpose(w9.reshape(3, 3, -1, o), (3, 2, 0, 1))
        return jax.lax.conv_general_dilated(
            q, w, (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32)

    def conv1(q, wio):
        w = jnp.transpose(wio, (1, 0))[:, :, None, None]
        return jax.lax.conv_general_dilated(
            q, w, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32)

    deq = lambda acc, swrow, brow: (
        acc.astype(jnp.float32) * swrow[None, :, None, None]
        + brow[None, :, None, None])

    def elu(v):
        # the SAME exp(v)-1 form as the kernel (Pallas TPU lacks expm1):
        # jax.nn.elu here would disagree with the kernel by up to ~6e-8 near
        # 0, enough to flip an int8 round() on unlucky values
        return jnp.where(v > 0, v, jnp.exp(jnp.minimum(v, 0.0)) - 1.0)

    # residual canvases round-trip through bf16, matching the kernel's
    # VMEM-budget canvas dtype exactly
    bf = lambda v: v.astype(jnp.bfloat16)
    f32 = lambda v: v.astype(jnp.float32)

    r1 = bf(deq(conv1(xq, qw["w1"][:xq.shape[1]]), qw["sw"][0],
                qw["bias"][0]))
    q1 = _q(f32(r1), s[1])
    e2a = elu(deq(conv3(q1, qw["w2a"]), qw["sw"][1], qw["bias"][1]))
    q2a = _q(e2a, s[2])
    r2 = deq(conv1(q2a, qw["w2b"]), qw["sw"][2], qw["bias"][2]) + f32(r1)
    e2 = bf(elu(r2))
    q2 = _q(f32(e2), s[3])
    e4a = elu(deq(conv3(q2, qw["w4a"]), qw["sw"][3], qw["bias"][3]))
    q4a = _q(e4a, s[4])
    r4 = deq(conv1(q4a, qw["w4b"]), qw["sw"][4], qw["bias"][4]) + f32(e2)
    e4 = bf(elu(r4))
    q4 = _q(f32(e4), s[5])
    e6a = elu(deq(conv3(q4, qw["w6a"]), qw["sw"][5], qw["bias"][5]))
    q6a = _q(e6a, s[6])
    r6 = deq(conv1(q6a, qw["w6b"]), qw["sw"][6], qw["bias"][6]) + f32(e4)
    q6 = _q(elu(r6), s[7])
    out = (conv3(q6, qw["w7"]).astype(jnp.float32)
           * qw["sw7"][None, :, None, None]
           + qw["bias7"][None, :, None, None])
    return out


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _kernel(inv_s_ref, x_hbm, w1_ref, w2a_ref, w2b_ref, w4a_ref, w4b_ref,
            w6a_ref, w6b_ref, w7_ref, sw_ref, bias_ref, sw7_ref, bias7_ref,
            out_ref, xs_ref, sem, *, th, tw, cols, h, w, cin, c, nout,
            out_dtype, ablate=()):
    """One (batch, row-tile, col-tile) program: the full paired tower in
    VMEM, on FLAT canvases.

    Layout: every activation is a 2-D (rows*cols, channels) array whose
    sublane dim flattens (canvas_row, canvas_col) with a FIXED column count
    ``cols`` = tw + 8 halo cols rounded up to the 32-sublane int8 tile, so
    - a dy (row) tap is a flat slice at offset dy*cols — tile-aligned, free;
    - a dx (col) tap becomes a ±1 pltpu.roll of the int32 accumulator;
    - reshapes/unaligned slices never happen (they were 2.6x the MXU time
      in the first, shrinking-canvas version of this kernel).
    Rows shrink by 2 per 3x3 conv (halo consumption); cols stay fixed, with
    out-of-image / pad-col positions re-zeroed at every int8 quantization
    (one computed mask per site), which keeps SAME-conv semantics exact.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    r0 = i * th                       # window start row in the padded input
    c0 = j * tw                       # window start col (8-aligned: tw % 8)
    rr = th + 8                       # window rows
    wp = tw + 8                       # valid window cols (<= cols)

    # DMA the (rr, wp, cin) input window into the left wp cols of the
    # (rr, cols, cin) scratch; the pad cols hold garbage that every mask
    # zeroes before it can reach a valid output.
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, rr), pl.ds(c0, wp)],
        xs_ref.at[:, pl.ds(0, wp)], sem)
    cp.start()

    def site_mask(level, nrows):
        """(nrows*cols, 1) bool: flat canvas position -> inside the image.
        At shrink level L, canvas row r maps to image row r0 - 4 + L + r;
        canvas col q maps to image col c0 - 4 + q, valid iff q < wp too.
        row/col come from a float reciprocal-floor (vectorized) rather than
        integer div (scalarized by Mosaic)."""
        m = jax.lax.broadcasted_iota(jnp.int32, (nrows * cols, 1), 0)
        row = jnp.floor(m.astype(jnp.float32) * (1.0 / cols) +
                        (0.5 / cols)).astype(jnp.int32)
        col = m - row * cols
        irow = row + (r0 - 4 + level)
        icol = col + (c0 - 4)
        ok = jnp.logical_and(
            jnp.logical_and(irow >= 0, irow < h),
            jnp.logical_and(jnp.logical_and(icol >= 0, icol < w), col < wp))
        return ok

    # one mask per shrink level, shared by both quant sites of that level
    rows_at = {0: rr, 1: rr - 2, 2: rr - 4, 3: rr - 6}
    masks = ({} if "nomask" in ablate
             else {lv: site_mask(lv, nr) for lv, nr in rows_at.items()})

    def _qf(v, inv_row, level):
        """Masked f32 quantized values (pre-int8-cast)."""
        if "noquant" in ablate:          # timing ablation: plain pass
            return v
        q = jnp.clip(jnp.round(v * inv_row[None, :]), -127, 127)
        if "nomask" in ablate:
            return q
        return jnp.where(masks[level], q, 0.0)

    def quant(v, inv_row, level):
        """Per-channel int8 quantization + border zeroing (v flat (M, c))."""
        return _qf(v, inv_row, level).astype(jnp.int8)

    def quant3(v, inv_row, level):
        """Like quant, but also returns the ±1 col-shifted canvases (rolled
        in f32 — pltpu.roll is 32-bit only — then cast): the dx taps of the
        downstream 3x3 conv, precomputed so the conv can be ONE deep-K dot.
        The MXU only engages its 2x int8 rate for contractions >= 256 deep;
        nine separate K=128 tap-dots run at bf16 speed."""
        qf = _qf(v, inv_row, level)
        m = qf.shape[0]
        if "noroll" in ablate:           # timing ablation: wrong numerics
            qc = qf.astype(jnp.int8)
            return qc, qc, qc
        return (pltpu.roll(qf, 1, 0).astype(jnp.int8),    # value from m-1
                qf.astype(jnp.int8),
                pltpu.roll(qf, m - 1, 0).astype(jnp.int8))  # value from m+1

    def conv3x3(qt, w9, swrow, brow):
        """qt = quant3 triple, flat (R*cols, c) int8 each -> f32
        ((R-2)*cols, cout) dequantized.  dy taps are aligned flat slices
        (free); dx taps are the pre-shifted canvases; the 9-tap patch is a
        lane-concat feeding ONE K=9c dot (int8 MXU 2x needs deep K)."""
        qm1, qc, qp1 = qt
        m = qc.shape[0]
        mo = m - 2 * cols
        parts = []
        for dy in range(3):
            o = dy * cols
            parts += [qm1[o:o + mo], qc[o:o + mo], qp1[o:o + mo]]
        patch = jnp.concatenate(parts, axis=1)          # (mo, 9c)
        wflat = w9.reshape(9 * w9.shape[1], w9.shape[2])
        acc = jnp.dot(patch, wflat, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * swrow[None, :] + brow[None, :]

    def conv1x1(q, wio, swrow, brow):
        acc = jnp.dot(q, wio, preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * swrow[None, :] + brow[None, :]

    def elu(v):
        # jax.nn.elu lowers to expm1 (no Pallas TPU lowering); exp is fine:
        # the result is immediately re-quantized to int8 anyway.
        if "noelu" in ablate:            # timing ablation: leaky instead
            return jnp.where(v > 0, v, 0.1 * v)
        return jnp.where(v > 0, v, jnp.exp(jnp.minimum(v, 0.0)) - 1.0)

    inv = [inv_s_ref[k] for k in range(8)]
    sw = [sw_ref[k] for k in range(7)]
    bias = [bias_ref[k] for k in range(7)]

    cp.wait()
    xq = xs_ref[...].reshape(rr * cols, cin)

    # Residual canvases ride bf16 (VMEM budget: f32 versions blow the
    # ~16 MB scoped limit); epilogue math stays f32.  bf16 canvas noise
    # (2^-8 relative) sits below the int8 quantization noise itself, and
    # the oracle applies the same casts, so tests stay exact.
    bf = jnp.bfloat16
    f32 = jnp.float32

    # L1: 1x1 in-projection (pad-col garbage in xq is finite int8 and gets
    # masked at q1)
    r1 = conv1x1(xq, w1_ref[...], sw[0], bias[0]).astype(bf)
    q1 = quant3(r1.astype(f32), inv[1], 0)

    # L2: 3x3 -> elu -> 1x1, residual (canvas offsets: one row per level)
    e2a = elu(conv3x3(q1, w2a_ref[...], sw[1], bias[1]))
    q2a = quant(e2a, inv[2], 1)
    m2 = q2a.shape[0]
    r2 = (conv1x1(q2a, w2b_ref[...], sw[2], bias[2])
          + r1[cols:cols + m2].astype(f32))
    e2 = elu(r2).astype(bf)
    q2 = quant3(e2.astype(f32), inv[3], 1)

    # L4
    e4a = elu(conv3x3(q2, w4a_ref[...], sw[3], bias[3]))
    q4a = quant(e4a, inv[4], 2)
    m4 = q4a.shape[0]
    r4 = (conv1x1(q4a, w4b_ref[...], sw[4], bias[4])
          + e2[cols:cols + m4].astype(f32))
    e4 = elu(r4).astype(bf)
    q4 = quant3(e4.astype(f32), inv[5], 2)

    # L6
    e6a = elu(conv3x3(q4, w6a_ref[...], sw[5], bias[5]))
    q6a = quant(e6a, inv[6], 3)
    m6 = q6a.shape[0]
    r6 = (conv1x1(q6a, w6b_ref[...], sw[6], bias[6])
          + e4[cols:cols + m6].astype(f32))
    q6 = quant3(elu(r6), inv[7], 3)

    # L7: final 3x3 -> (th*cols, nout); extract the (th, tw) interior.
    # The interior starts at col 4 (unaligned): rotate the flat canvas left
    # by 4 so it starts at col 0, then slice at aligned offsets (a direct 4D
    # slice at offset 4 lowers to an unsupported >2D gather).
    out = conv3x3(q6, w7_ref[...], sw7_ref[0], bias7_ref[0])
    out = pltpu.roll(out, out.shape[0] - 4, 0)     # f32: 32-bit rollable
    out = out.astype(out_dtype)
    for r in range(th):                       # 2D aligned stores per row
        out_ref[0, r] = out[r * cols:r * cols + tw]


def _pick_tiles(h, w):
    """Default (th, tw): keep the whole working set under the ~16 MB scoped
    VMEM limit at flagship shapes (512x512, C=128)."""
    tw = w if w <= 256 else w // 2
    return 4, tw


def fused_pair_tower(xq_padded, qw, scales, *, h, w, th=None, tw=None,
                     out_dtype=jnp.bfloat16, interpret=False, ablate=()):
    """Run the fused int8 paired tower.

    xq_padded: (B, H+8, W+8, Cin) int8 — input conditions, NHWC, quantized
      per-channel with scales[0, :Cin] and zero-padded by 4 on H and W.
    qw: ``quantize_pair_tower`` output. scales: (8, C) f32 from
      ``pair_tower_calibrate``.
    Returns (B, H, W, Nout) out_dtype (the raw (s|t) stack, pre-clamp).
    """
    b = xq_padded.shape[0]
    cin = xq_padded.shape[-1]
    c = qw["w1"].shape[-1]
    nout = qw["w7"].shape[-1]
    dth, dtw = _pick_tiles(h, w)
    th = dth if th is None else th
    tw = dtw if tw is None else tw
    assert h % th == 0 and w % tw == 0 and tw % 8 == 0, (h, th, w, tw)
    cols = tw + 8 + (-(tw + 8)) % 32          # fixed flat-canvas col count
    grid = (b, h // th, w // tw)

    kern = functools.partial(
        _kernel, th=th, tw=tw, cols=cols, h=h, w=w, cin=cin, c=c, nout=nout,
        out_dtype=out_dtype, ablate=tuple(ablate))
    flops = 2 * b * h * w * c * (cin + 9 * c * 3 + c * 3 + 9 * nout)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # inv scales (8, C)
            pl.BlockSpec(memory_space=pl.ANY),          # x (manual DMA)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2a
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w2b
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w4a
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w4b
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w6a
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w6b
            pl.BlockSpec(memory_space=pltpu.VMEM),      # w7
            pl.BlockSpec(memory_space=pltpu.VMEM),      # sw (7, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (7, C)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # sw7 (1, Nout)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias7 (1, Nout)
        ],
        out_specs=pl.BlockSpec((1, th, tw, nout),
                               lambda bb, ii, jj: (bb, ii, jj, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 8, cols, cin), jnp.int8),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=xq_padded.size + b * h * w * nout * 2,
            transcendentals=b * h * w * c * 7),
        interpret=interpret,
    )((1.0 / scales).astype(jnp.float32), xq_padded, qw["w1"], qw["w2a"],
      qw["w2b"], qw["w4a"], qw["w4b"], qw["w6a"], qw["w6b"], qw["w7"],
      qw["sw"], qw["bias"], qw["sw7"].reshape(1, -1),
      qw["bias7"].reshape(1, -1))


def quantize_input(x_nchw, scale_row):
    """(B, Cin, H, W) f32/bf16 -> (B, H+8, W+8, ceil128(Cin)) int8,
    zero-padded by 4 spatially and to the 128-lane int8 tile on channels
    (Mosaic requires 128-aligned minor dims for the manual HBM DMA; the
    padded weight rows in ``quantize_pair_tower`` are zero).

    scale_row: the (C,) calibration row scales[0]; only the first Cin
    entries apply."""
    cin = x_nchw.shape[1]
    inv = (1.0 / scale_row[:cin]).astype(jnp.float32)
    q = jnp.clip(jnp.round(x_nchw.astype(jnp.float32)
                           * inv[None, :, None, None]),
                 -127, 127).astype(jnp.int8)
    q = jnp.transpose(q, (0, 2, 3, 1))
    cpad = (-cin) % 128
    return jnp.pad(q, ((0, 0), (4, 4), (4, 4), (0, cpad)))
