"""Fused VMEM-resident cond-pair Pallas kernel — BUILT TO BE MEASURED.

The Conv3d(1->32) -> PReLU -> Conv3d(32->1) pair of the condition networks
(reference networks.py:221-239; XLA forms in models/cond_net.py) is the last
segment between the shipped 20.5 fps and the ~23.5 fps stack ceiling.
Round 3 declared a fused kernel dead *on paper*; round 4 builds it and
measures it (VERDICT item 1).  Results: scripts/bench_cond_pair.py ->
docs/PERFORMANCE.md round-4 section.

Round-4 measured platform rates that bound this kernel (scripts/
probe_vpu_rate.py + XLA probes, all on the live chip):

- VPU elementwise: ~0.24 TF/s f32 — in BOTH Pallas and XLA codegen (it is
  the platform, not the compiler).  MXU: 42-58 TF/s.  At a ~200:1
  MXU:VPU ratio every elementwise pass over the y intermediate costs
  multiple ms, so tap/roll/lane-select forms are ruled out; all heavy
  work must run as MXU dots.
- Pallas dots pay full 128-tile padding on BOTH contraction (K) and
  output (N) dims, and the pair's natural dims (K_a = 27 taps x 1
  channel, N_b = a band-3 depth coupling) are tiny — docs/CEILING.md
  derives the resulting (128/3)x invariant no packing escapes.

Kernel structure (grid = (B, H/th row bands); depth chunks of 4 live on
the lane axis, lane = chunk*8 + window_depth, processed sequentially
in-kernel with block-placed weight matrices):

  conv_a   per chunk, 9 accumulated [(m,128)@(128,128) + (m,128)@(128,64)]
           bf16 dots; input = host-prepped depth-window canvases
           (x3 pre-shifted column copies so the kernel never rolls).
           y_t lanes = (c in 0..3)*32+k [lo] / halo depths {-1,+4} [hi].
  PReLU    VPU f32 (single shared alpha per net) + SAME-pad boundary
           masking (row/col/global-depth zeros), bf16 cast.
  conv_b   per chunk, 9 accumulated [(m,128)@(128,128) + (m,64)@(64,128)]
           bf16 dots straight into the lane-blocked z accumulator
           (z lanes = chunk*8 + c_out); spatial taps are flat row-offset
           reads of the y scratch.

Numerics match `_conv3d_pair_depthbatch` modulo bf16 dot rounding
(tests/test_cond_pair.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


T = 4           # output depths per chunk
WIN = T + 4     # window depths per chunk (2-halo: halo-y taps reach +-2)
MAX_CHUNKS = 16  # lane capacity: 16 chunks x 8 window depths = 128


def _round_up(v, m):
    return v + (-v) % m


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


def prep_input(x):
    """x (B, D, H, W) -> 3 column-pre-shifted canvases, each
    (B, H+4, Wp, 128) bf16 with lane = chunk*8 + j holding depth
    chunk*4 + j - 2 (zero outside [0, D)), 2-pixel zero spatial border,
    Wp a multiple of 8.  Requires D/4 <= 16 chunks (the caller slabs
    larger depths).  Canvas s holds columns displaced by s-1 so the
    kernel reads tap (dh, dw) as canvas[dw] at row offset dh with no
    in-kernel rolls (lane/flat rolls run at the 0.24 TF/s VPU rate)."""
    b, d, h, w = x.shape
    assert d % T == 0 and d // T <= MAX_CHUNKS, (d,)
    nc = d // T
    wp = _round_up(w + 4, 8)
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (2, 2), (2, 2), (2, wp - w - 2)))
    wins = jnp.stack([xp[:, j:j + d - T + 1:T] for j in range(WIN)],
                     axis=-1)                      # (B, nc, H+4, Wp, 8)
    wins = jnp.transpose(wins, (0, 2, 3, 1, 4))    # (B, H+4, Wp, nc, 8)
    wins = wins.reshape(b, h + 4, wp, nc * 8)
    wins = jnp.pad(wins, ((0, 0), (0, 0), (0, 0), (0, 128 - nc * 8)))
    return [jnp.roll(wins, 1 - s, axis=2).astype(jnp.bfloat16)
            for s in range(3)]


def pack_weights(params, n_chunks: int):
    """Pack one cond net's pair weights (models/cond_net.py layout:
    wa (K,1,kh,kw,dc), wb (1,K,kh,kw,dc); kernel dims act on (H, W,
    depth)) into per-chunk block-placed bf16 B-matrices."""
    wa = np.asarray(params["c3a"]["w"], np.float32)
    wb = np.asarray(params["c3b"]["w"], np.float32)
    k = wa.shape[0]
    assert k == 32, k
    nc = n_chunks
    # conv_a: A lanes 8t+j (window depth 4t+j-2); y_t lanes c*32+kk
    # (depth 4t+c) with j = c + dc + 1, plus hi halo depths {-1, +4}
    ba_lo = np.zeros((nc, 9, 128, 128), np.float32)
    ba_hi = np.zeros((nc, 9, 128, 64), np.float32)
    # conv_b: K = y_t lanes; N lanes 8t + c_out
    bb_lo = np.zeros((nc, 9, 128, 128), np.float32)
    bb_hi = np.zeros((nc, 9, 64, 128), np.float32)
    for t in range(nc):
        for dh in range(3):
            for dw in range(3):
                tau = dh * 3 + dw
                for kk in range(k):
                    for dc in range(3):
                        wv = wa[kk, 0, dh, dw, dc]
                        for c in range(T):
                            ba_lo[t, tau, 8 * t + c + dc + 1,
                                  c * k + kk] = wv
                        for ci, c in enumerate((-1, T)):
                            ba_hi[t, tau, 8 * t + c + dc + 1,
                                  ci * k + kk] = wv
                        wv2 = wb[0, kk, dh, dw, dc]
                        for c_out in range(T):
                            c_y = c_out + dc - 1
                            if 0 <= c_y < T:
                                bb_lo[t, tau, c_y * k + kk,
                                      8 * t + c_out] = wv2
                            elif c_y == -1:
                                bb_hi[t, tau, kk, 8 * t + c_out] = wv2
                            else:        # c_y == T
                                bb_hi[t, tau, k + kk, 8 * t + c_out] = wv2
    zeros = lambda n: np.zeros((n,), np.float32)
    bias_a = np.asarray(params["c3a"].get("b", zeros(k)), np.float32)
    bias_b = np.asarray(params["c3b"].get("b", zeros(1)), np.float32)
    alpha = float(np.asarray(params["prelu"]["alpha"]).reshape(()))
    return {
        "ba_lo": jnp.asarray(ba_lo, jnp.bfloat16),
        "ba_hi": jnp.asarray(ba_hi, jnp.bfloat16),
        "bb_lo": jnp.asarray(bb_lo, jnp.bfloat16),
        "bb_hi": jnp.asarray(bb_hi, jnp.bfloat16),
        "brow_lo": jnp.asarray(np.tile(bias_a, T)[None, :], jnp.float32),
        "brow_hi": jnp.asarray(np.tile(bias_a, 2)[None, :], jnp.float32),
        "scalars": jnp.asarray([[alpha, float(bias_b[0])]], jnp.float32),
    }


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _kernel(x0_hbm, x1_hbm, x2_hbm, ba_lo, ba_hi, bb_lo, bb_hi,
            brow_lo, brow_hi, scalars, out_ref,
            xs0, xs1, xs2, y_lo_buf, y_hi_buf, sems,
            *, th, h, w, wp, n_chunks, lo_edge, hi_edge, out_dtype):
    bb = pl.program_id(0)
    i = pl.program_id(1)
    my = (th + 2) * wp               # y rows: image rows [i*th-1, i*th+th+1)
    mo = th * wp

    scr = (xs0, xs1, xs2)
    cps = []
    for s, xh in enumerate((x0_hbm, x1_hbm, x2_hbm)):
        cp = pltpu.make_async_copy(
            xh.at[bb, pl.ds(i * th, th + 4)], scr[s], sems.at[s])
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    a_taps = [scr[dw][...].reshape((th + 4) * wp, 128)
              for dw in range(3)]

    # SAME-pad validity of y positions: rows [0, h), cols [2, w+2)
    flat = jax.lax.broadcasted_iota(jnp.int32, (my, 1), 0)
    row = jnp.floor(flat.astype(jnp.float32) * (1.0 / wp)
                    + (0.5 / wp)).astype(jnp.int32)
    col = flat - row * wp
    irow = row + (i * th - 1)
    ok = jnp.logical_and(
        jnp.logical_and(irow >= 0, irow < h),
        jnp.logical_and(col >= 2, col < w + 2)).astype(jnp.float32)
    al = scalars[0, 0]

    z = None
    for t in range(n_chunks):
        acc_lo = None
        acc_hi = None
        for dh in range(3):
            for dw in range(3):
                tau = dh * 3 + dw
                a = a_taps[dw][dh * wp:dh * wp + my]
                d_lo = jnp.dot(a, ba_lo[t, tau],
                               preferred_element_type=jnp.float32)
                d_hi = jnp.dot(a, ba_hi[t, tau],
                               preferred_element_type=jnp.float32)
                acc_lo = d_lo if acc_lo is None else acc_lo + d_lo
                acc_hi = d_hi if acc_hi is None else acc_hi + d_hi
        acc_lo = acc_lo + brow_lo[...]
        acc_hi = acc_hi + brow_hi[...]
        y_lo = jnp.where(acc_lo > 0, acc_lo, al * acc_lo) * ok
        y_hi = jnp.where(acc_hi > 0, acc_hi, al * acc_hi) * ok
        if t == 0 and lo_edge and t == n_chunks - 1 and hi_edge:
            y_hi = y_hi * 0.0
        elif t == 0 and lo_edge:
            lane64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
            y_hi = jnp.where(lane64 < 32, 0.0, y_hi)
        elif t == n_chunks - 1 and hi_edge:
            lane64 = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
            y_hi = jnp.where(lane64 >= 32, 0.0, y_hi)
        # leading + trailing zero rows keep every tap slice in range (the
        # dw=+1 tap on the last row bleeds one element into the trailing
        # row; it lands only in cropped border columns)
        y_lo_buf[0:wp] = jnp.zeros((wp, 128), jnp.bfloat16)
        y_hi_buf[0:wp] = jnp.zeros((wp, 64), jnp.bfloat16)
        y_lo_buf[wp:wp + my] = y_lo.astype(jnp.bfloat16)
        y_hi_buf[wp:wp + my] = y_hi.astype(jnp.bfloat16)
        y_lo_buf[wp + my:] = jnp.zeros((wp, 128), jnp.bfloat16)
        y_hi_buf[wp + my:] = jnp.zeros((wp, 64), jnp.bfloat16)

        ylo = y_lo_buf[...]
        yhi = y_hi_buf[...]
        for dh in range(3):
            for dw in range(3):
                tau = dh * 3 + dw
                # z row r (image row i*th+r) sits at y-buffer row r+2;
                # tap (dh-1, dw-1): flat start (dh+1)*wp + dw - 1 >= wp-1
                o = (dh + 1) * wp + dw - 1
                d = jnp.dot(ylo[o:o + mo], bb_lo[t, tau],
                            preferred_element_type=jnp.float32) \
                    + jnp.dot(yhi[o:o + mo], bb_hi[t, tau],
                              preferred_element_type=jnp.float32)
                z = d if z is None else z + d
    out_ref[...] = (z + scalars[0, 1]).astype(out_dtype).reshape(
        1, 1, th, wp, 128)


def _run_slab(x, params, *, th, lo_edge, hi_edge, out_dtype, interpret):
    b, d, h, w = x.shape
    canvases = prep_input(x)
    wp = canvases[0].shape[2]
    n_chunks = d // T
    packed = pack_weights(params, n_chunks)
    grid = (b, h // th)
    my = (th + 2) * wp

    kern = functools.partial(
        _kernel, th=th, h=h, w=w, wp=wp, n_chunks=n_chunks,
        lo_edge=lo_edge, hi_edge=hi_edge, out_dtype=out_dtype)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[anyspec] * 3 + [wspec] * 7,
        out_specs=pl.BlockSpec(
            (1, 1, th, wp, 128),
            lambda bb, i: (bb, i, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, h // th, th, wp, 128), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, wp, 128), jnp.bfloat16),
            pltpu.VMEM((th + 4, wp, 128), jnp.bfloat16),
            pltpu.VMEM((th + 4, wp, 128), jnp.bfloat16),
            pltpu.VMEM((my + 2 * wp, 128), jnp.bfloat16),
            pltpu.VMEM((my + 2 * wp, 64), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(canvases[0], canvases[1], canvases[2],
      packed["ba_lo"], packed["ba_hi"], packed["bb_lo"], packed["bb_hi"],
      packed["brow_lo"], packed["brow_hi"], packed["scalars"])
    # (B, H/th, th, Wp, 128) -> (B, D_slab, H, W)
    out = out.reshape(b, h, wp, MAX_CHUNKS, 8)[:, :, 2:2 + w, :n_chunks, :T]
    return jnp.transpose(out, (0, 3, 4, 1, 2)).reshape(b, d, h, w)


def cond_pair_fused(x, params, *, th=4, out_dtype=jnp.float32,
                    interpret=False, max_chunks=MAX_CHUNKS):
    """Run the fused pair on x (B, D, H, W); returns (B, D, H, W).
    Depths beyond max_chunks*4 per call are processed in slabs whose
    canvases carry the 2-depth halo (window overlap), so slab outputs
    concatenate exactly.  Requires D %% 4 == 0 (the depth-chunk lane
    packing); the D=6 cond net is NOT expressible in this packing — one
    more reason the shipped path stays XLA.  See module docstring —
    round-4 measurement build."""
    b, d, h, w = x.shape
    assert d % T == 0, (
        f"cond_pair_fused requires depth % {T} == 0, got D={d} (the "
        f"slab pre-slice would otherwise silently truncate depths)")
    nc = d // T
    # slabs: one extra chunk each side rides along so the +-2-depth
    # window is fully populated; its output is cropped away
    step = max_chunks if nc <= max_chunks else max_chunks - 2
    outs = []
    for c0 in range(0, nc, step):
        c1 = min(c0 + step, nc)
        e0 = max(c0 - 1, 0)
        e1 = min(c1 + 1, nc)
        xs = x[:, e0 * T:e1 * T]
        sub = _run_slab(xs, params, th=th, lo_edge=(e0 == 0),
                        hi_edge=(e1 == nc), out_dtype=out_dtype,
                        interpret=interpret)
        outs.append(sub[:, (c0 - e0) * T:(c0 - e0) * T + (c1 - c0) * T])
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
