"""Streaming bf16 fused wavelet-flow tower kernel (Pallas TPU).

Round-3 schedule family for the N=128 coupling-tower wall (the round-2 int8
kernel closed that question for quantization; this one attacks the SCHEDULE):

1. **Zero halo recompute.** The round-2 kernel used overlapping row windows
   (rows shrink 2 per 3x3 conv), which inflates MXU work by
   (th+6 + th+4 + th+2 + th)/(4*th) — 1.9x at th=4.  Here the grid's minor
   dimension streams row-tiles top-to-bottom over the image and each level's
   last two rows ride in VMEM scratch ACROSS grid programs (the TPU grid is
   sequential, so scratch persists).  Every 3x3 conv computes exactly ``th``
   new rows: the only inflation left is the column halo (cols/tw).
2. **bf16 end-to-end, VMEM-resident.** Activations never touch HBM between
   the 8 convs; dots are bf16 with f32 accumulation; epilogues (bias, ELU,
   residual) are f32 on the VPU.  None of the int8 machinery (per-site
   requantization, border re-zeroing masks at every site, int8 relayout
   constraints) that held the round-2 kernel at 6.3 ms exists here.
3. dx (column) taps come from f32 ``pltpu.roll`` pre-shifted canvases (the
   round-2 trick; bf16 is not rollable); dy taps are tile-aligned flat
   slices; the 3x3 conv is 9 accumulated (M,128)x(128,128) dots — the
   VMEM-resident chained-dot regime (scripts/bench_int8_micro.py chain) measured
   at ~110 TF/s bf16 vs ~70 through HBM.

Tower structure (reference networks.py:586-706, paired 128-wide by
models/cwf.pair_tower_params; same chain as ops/qtower):

    r1 = b1(x)                       1x1, Cin -> C
    e2 = elu(b2b(elu(b2a(r1))) + r1)
    e4 = elu(b4b(elu(b4a(e2))) + e2)
    e6 = elu(b6b(elu(b6a(e4))) + e4)
    out = b7(elu(e6))                3x3, C -> Nout

Geometry.  The padded input is (B, H+8, W+8, 128) (4-pixel zero border, the
total 3x3 halo; channels zero-padded to the 128-lane tile).  The grid is
(B, W/tw strips, H/th + 1 row programs); program i DMAs input rows
[i*th, i*th+th) — no row halo — and appends to per-level flat canvases
[2 carry rows | th new rows] of fixed width ``cols`` = tw + 16 (tw + 8 halo
cols + 8 alignment cols; bf16 sublane slicing needs cols % 16 == 0).  Each
level's output lags its input by one row, so program i >= 1 emits output
image rows [(i-1)*th, i*th); program 0 is warm-up.  Out-of-image positions
are zeroed before every 3x3 conv (one (m,1) mask per level per program) to
reproduce the reference's per-conv zero padding exactly; the 8 alignment
cols are never zeroed — their junk propagates inward one column per conv
and provably never reaches a valid output.

SAME-padding parity, bf16 canvas rounding, and the exp(x)-1 ELU form are
replicated bit-exactly by the jnp oracle ``pair_tower_bf16_reference``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


def _to3x3(w):
    """(O, I, 3, 3) -> (9, I, O) bf16, tap index ky*3+kx."""
    return jnp.transpose(w, (2, 3, 1, 0)).reshape(
        9, w.shape[1], w.shape[0]).astype(jnp.bfloat16)


def _to1x1(w, pad_in=None):
    """(O, I, 1, 1) -> (I, O) bf16, optionally zero-padding I."""
    m = jnp.transpose(w[:, :, 0, 0], (1, 0))
    if pad_in and m.shape[0] < pad_in:
        m = jnp.pad(m, ((0, pad_in - m.shape[0]), (0, 0)))
    return m.astype(jnp.bfloat16)


def pack_pair_tower_bf16(paired_params):
    """Pack one paired tower (models/cwf.pair_tower_params output, f32 OIHW)
    into the kernel's bf16 GEMM weight set + f32 bias rows."""
    p = paired_params
    c = p["b2a"]["w"].shape[0]
    nout = p["b7"]["w"].shape[0]
    zeros = lambda n: jnp.zeros((n,), jnp.float32)
    bias = lambda name, n: jnp.asarray(
        p[name].get("b", zeros(n)), jnp.float32).reshape(1, n)
    return {
        "w1": _to1x1(p["b1"]["w"], pad_in=128),
        "w2a": _to3x3(p["b2a"]["w"]), "w2b": _to1x1(p["b2b"]["w"]),
        "w4a": _to3x3(p["b4a"]["w"]), "w4b": _to1x1(p["b4b"]["w"]),
        "w6a": _to3x3(p["b6a"]["w"]), "w6b": _to1x1(p["b6b"]["w"]),
        "w7": _to3x3(p["b7"]["w"]),
        "bias1": bias("b1", c),
        "bias2a": bias("b2a", c), "bias2b": bias("b2b", c),
        "bias4a": bias("b4a", c), "bias4b": bias("b4b", c),
        "bias6a": bias("b6a", c), "bias6b": bias("b6b", c),
        "bias7": bias("b7", nout),
    }


def prep_input_bf16(x_nchw):
    """(B, Cin, H, W) -> (B, H+8, W+8, 128) bf16: NHWC, 4-pixel zero border,
    channels zero-padded to the 128 lane tile (the padded w1 rows are zero,
    so the dot is exact)."""
    x = jnp.transpose(x_nchw, (0, 2, 3, 1)).astype(jnp.bfloat16)
    cpad = 128 - x.shape[-1]
    return jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, cpad)))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _elu(v):
    # exp(x)-1 form: Pallas TPU has no expm1 lowering.  The oracle uses the
    # exact same expression.
    return jnp.where(v > 0, v, jnp.exp(jnp.minimum(v, 0.0)) - 1.0)


def _kernel(x_hbm, w1, w2a, w2b, w4a, w4b, w6a, w6b, w7,
            b1, b2a, b2b, b4a, b4b, b6a, b6b, b7,
            out_ref, xs, r1_buf, e2_buf, e4_buf, e6_buf, sem,
            *, th, tw, cols, h, w, c, nout, n_row_pgms, out_dtype,
            taps_mode):
    bb = pl.program_id(0)
    s = pl.program_id(1)
    i = pl.program_id(2)
    m = (th + 2) * cols               # canvas flat rows
    mo = th * cols                    # per-level new output rows
    c2 = 2 * cols

    # --- input DMA: rows [i*th, i*th+th), cols [s*tw, s*tw+tw+8) ---------
    cp = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(i * th, th), pl.ds(s * tw, tw + 8)],
        xs.at[:, pl.ds(0, tw + 8)], sem)
    cp.start()

    # --- carry management ------------------------------------------------
    @pl.when(i == 0)
    def _zero_carries():
        for buf in (r1_buf, e2_buf, e4_buf, e6_buf):
            buf[0:c2] = jnp.zeros((c2, c), jnp.bfloat16)

    @pl.when(i > 0)
    def _shift_carries():
        for buf in (r1_buf, e2_buf, e4_buf, e6_buf):
            buf[0:c2] = buf[th * cols:th * cols + c2]

    # --- per-level validity masks (m, 1): canvas position -> in-image ----
    # canvas row r of level L maps to padded image row i*th - L - 2 + r;
    # canvas col q maps to padded image col s*tw + q.  Valid image region in
    # padded coords is [4, h+4) x [4, w+4).  Row/col from a float
    # reciprocal-floor (integer div scalarizes under Mosaic).
    flat = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    row = jnp.floor(flat.astype(jnp.float32) * (1.0 / cols)
                    + (0.5 / cols)).astype(jnp.int32)
    col = flat - row * cols
    icol = col + (s * tw)
    col_ok = jnp.logical_and(icol >= 4, icol < w + 4)

    def level_mask(lvl):
        irow = row + (i * th - lvl - 2)
        ok = jnp.logical_and(jnp.logical_and(irow >= 4, irow < h + 4),
                             col_ok)
        return ok.astype(jnp.float32)

    masks = [level_mask(lv) for lv in range(4)]

    def tri(buf, lvl):
        """Masked bf16 canvas + its +-1 col-shifted copies (dx taps)."""
        vf = buf[...].astype(jnp.float32) * masks[lvl]
        return (pltpu.roll(vf, 1, 0).astype(jnp.bfloat16),   # in[pos-1]
                vf.astype(jnp.bfloat16),
                pltpu.roll(vf, m - 1, 0).astype(jnp.bfloat16))

    def conv3(t3, w9, brow):
        """3x3 conv on the canvas: 9 accumulated (mo, C)x(C, N) bf16 dots
        (taps_mode='dots') or one (mo, 9C)x(9C, N) dot ('patch')."""
        tm1, tc, tp1 = t3
        if taps_mode == "patch":
            parts = []
            for dy in range(3):
                o = dy * cols
                parts += [tm1[o:o + mo], tc[o:o + mo], tp1[o:o + mo]]
            patch = jnp.concatenate(parts, axis=1)
            wf = w9[...].reshape(9 * w9.shape[1], w9.shape[2])
            acc = jnp.dot(patch, wf, preferred_element_type=jnp.float32)
        else:
            acc = None
            for dy in range(3):
                o = dy * cols
                for kx, tcv in enumerate((tm1, tc, tp1)):
                    d = jnp.dot(tcv[o:o + mo], w9[dy * 3 + kx],
                                preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
        return acc + brow[...]

    def conv1(v_bf, wio, brow):
        return jnp.dot(v_bf, wio[...],
                       preferred_element_type=jnp.float32) + brow[...]

    cp.wait()
    xs[:, tw + 8:] = jnp.zeros((th, cols - tw - 8, 128), jnp.bfloat16)
    x = xs[...].reshape(mo, 128)

    # L0: 1x1 in-projection (x's zero-pad region yields bias junk in r1;
    # masked at the conv3 input site like every level)
    r1_buf[c2:] = conv1(x, w1, b1).astype(jnp.bfloat16)

    def res_level(in_buf, lvl, w3, b3, w1x1, b1x1, out_buf):
        ea = _elu(conv3(tri(in_buf, lvl), w3, b3))
        r = (conv1(ea.astype(jnp.bfloat16), w1x1, b1x1)
             + in_buf[cols:cols + mo].astype(jnp.float32))
        out_buf[c2:] = _elu(r).astype(jnp.bfloat16)

    res_level(r1_buf, 0, w2a, b2a, w2b, b2b, e2_buf)
    res_level(e2_buf, 1, w4a, b4a, w4b, b4b, e4_buf)
    res_level(e4_buf, 2, w6a, b6a, w6b, b6b, e6_buf)

    lag = 8 // th                     # warm-up programs before output flows

    @pl.when(i >= lag)
    def _emit():
        out = conv3(tri(e6_buf, 3), w7, b7)
        # interior starts at canvas col 4 (unaligned): rotate left by 4,
        # then store row-by-row at aligned offsets (round-2 trick).
        out = pltpu.roll(out, mo - 4, 0).astype(out_dtype)
        for r in range(th):
            out_ref[0, r] = out[r * cols:r * cols + tw]


def fused_pair_tower_bf16(xp, wp, *, h, w, th=8, tw=256,
                          out_dtype=jnp.bfloat16, interpret=False,
                          taps_mode="dots"):
    """Run the streaming bf16 paired tower.

    xp: (B, H+8, W+8, 128) bf16 from ``prep_input_bf16``.
    wp: ``pack_pair_tower_bf16`` output.
    Returns (B, H, W, Nout) out_dtype — the raw (s|t) stack, pre-clamp.
    """
    b = xp.shape[0]
    c = wp["w2a"].shape[-1]
    nout = wp["w7"].shape[-1]
    assert h % th == 0 and w % tw == 0 and 8 % th == 0, (h, th, w, tw)
    cols = tw + 16
    lag = 8 // th
    n_row_pgms = h // th + lag
    grid = (b, w // tw, n_row_pgms)

    kern = functools.partial(
        _kernel, th=th, tw=tw, cols=cols, h=h, w=w, c=c, nout=nout,
        n_row_pgms=n_row_pgms, out_dtype=out_dtype, taps_mode=taps_mode)
    flops = 2 * b * h * w * c * (128 + 9 * c * 3 + c * 3 + 9 * nout)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vspec] * 16,
        out_specs=pl.BlockSpec(
            (1, th, tw, nout),
            lambda bb, s, i: (bb, jax.lax.max(i - lag, 0), s, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th, cols, 128), jnp.bfloat16),          # input tile
            pltpu.VMEM(((th + 2) * cols, c), jnp.bfloat16),     # r1
            pltpu.VMEM(((th + 2) * cols, c), jnp.bfloat16),     # e2
            pltpu.VMEM(((th + 2) * cols, c), jnp.bfloat16),     # e4
            pltpu.VMEM(((th + 2) * cols, c), jnp.bfloat16),     # e6
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * 2 + b * h * w * nout * 2,
            transcendentals=b * h * w * c * 7),
        interpret=interpret,
    )(xp, wp["w1"], wp["w2a"], wp["w2b"], wp["w4a"], wp["w4b"],
      wp["w6a"], wp["w6b"], wp["w7"],
      wp["bias1"], wp["bias2a"], wp["bias2b"], wp["bias4a"], wp["bias4b"],
      wp["bias6a"], wp["bias6b"], wp["bias7"])


# ---------------------------------------------------------------------------
# jnp oracle: the exact cast structure of the kernel, in NCHW
# ---------------------------------------------------------------------------


def pair_tower_bf16_reference(paired_params, x_nchw):
    """Bit-parity oracle for the kernel (bf16 canvases between convs, f32
    epilogues, exp(x)-1 ELU).  x_nchw: (B, Cin, H, W).  Returns
    (B, Nout, H, W) f32."""
    p = paired_params

    def conv(name, v, f32_out=True):
        wq = jnp.asarray(p[name]["w"], jnp.float32).astype(jnp.bfloat16)
        pad = 1 if wq.shape[-1] == 3 else 0
        acc = jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16), wq, (1, 1), [(pad, pad)] * 2,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        bias = p[name].get("b")
        if bias is not None:
            acc = acc + jnp.asarray(bias, jnp.float32)[None, :, None, None]
        return acc

    elu = lambda v: jnp.where(v > 0, v, jnp.exp(jnp.minimum(v, 0.0)) - 1.0)
    bf = lambda v: v.astype(jnp.bfloat16)

    r1 = bf(conv("b1", x_nchw.astype(jnp.bfloat16)))
    e2 = bf(elu(conv("b2b", bf(elu(conv("b2a", r1))))
                + r1.astype(jnp.float32)))
    e4 = bf(elu(conv("b4b", bf(elu(conv("b4a", e2))))
                + e2.astype(jnp.float32)))
    e6 = bf(elu(conv("b6b", bf(elu(conv("b6a", e4))))
                + e4.astype(jnp.float32)))
    return conv("b7", bf(e6))
