"""Round-2 int8/bf16 micro-probes, consolidated (VERDICT r3 hygiene item).

Archival measurement rigs behind one CLI; outcomes live in
docs/PERFORMANCE.md round-2 sections and CLAUDE.md:

  conv    int8 vs bf16 for the flow-tower hot conv (3x3 128->128 @512^2):
          conv_general_dilated NCHW/NHWC, 9-shifted-dot GEMM, dynamic-
          quantization + epilogue overheads.  Outcome: N=128 towers tie.
  dot     pure dot_general rates at the tower GEMM shapes (im2col K=1152
          etc.), operands generated on device.  Outcome: the int8 2x MXU
          rate only engages at N>=256.
  pallas  Pallas vs XLA GEMM at the tower shapes with dispatch amortized.
  chain   chained N=128 dots on VMEM-resident data (the fused-tower
          ceiling probe: ~110 TF/s bf16 vs ~70 through HBM) + int8-out
          write-traffic variant.

Usage: python scripts/bench_int8_micro.py [conv|dot|pallas|chain]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


@partial(jax.jit, static_argnums=(1, 2))
def _mk(key, shape, dt):
    if dt == jnp.int8:
        return jax.random.randint(key, shape, -127, 128, jnp.int8)
    return jax.random.normal(key, shape, dt)


# ---------------------------------------------------------------- probe: conv


def probe_conv():
    """int8 vs bf16 tower-conv formulations (r2 probe 1)."""
    B, H, W, C = 4, 512, 512, 128
    flops_conv = 2 * B * H * W * 9 * C * C
    rng = np.random.RandomState(0)
    x_f = jnp.asarray(rng.randn(B, C, H, W).astype(np.float32))
    w_f = jnp.asarray(rng.randn(C, C, 3, 3).astype(np.float32) * 0.05)
    x_bf, w_bf = x_f.astype(jnp.bfloat16), w_f.astype(jnp.bfloat16)
    x_i8 = jnp.asarray(rng.randint(-127, 128, (B, C, H, W), dtype=np.int8))
    w_i8 = jnp.asarray(rng.randint(-127, 128, (C, C, 3, 3), dtype=np.int8))

    dn = jax.lax.conv_dimension_numbers(x_f.shape, w_f.shape,
                                        ("NCHW", "OIHW", "NCHW"))

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                            dimension_numbers=dn)

    @jax.jit
    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    x_i8_nhwc = jnp.transpose(x_i8, (0, 2, 3, 1))
    w_i8_hwio = jnp.transpose(w_i8, (2, 3, 1, 0))
    dn2 = jax.lax.conv_dimension_numbers(
        x_i8_nhwc.shape, w_i8_hwio.shape, ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_i8_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn2,
            preferred_element_type=jnp.int32)

    @jax.jit
    def conv_bf16_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn2)

    @jax.jit
    def conv_i8_9dot(x_nhwc, w_hwio):
        xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, W, C), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                xs = xp[:, dy:dy + H, dx:dx + W, :]
                acc = acc + jax.lax.dot_general(
                    xs, w_hwio[dy, dx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
        return acc

    @jax.jit
    def dynquant(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = amax / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale

    sc = jnp.float32(0.01)

    @jax.jit
    def epilogue(acc):
        return jax.nn.elu(acc.astype(jnp.float32) * sc).astype(jnp.bfloat16)

    for name, fn, args, flops in [
        ("conv_bf16_nchw", conv_bf16, (x_bf, w_bf), flops_conv),
        ("conv_bf16_nhwc", conv_bf16_nhwc,
         (jnp.transpose(x_bf, (0, 2, 3, 1)),
          jnp.transpose(w_bf, (2, 3, 1, 0))), flops_conv),
        ("conv_i8_nchw", conv_i8, (x_i8, w_i8), flops_conv),
        ("conv_i8_nhwc", conv_i8_nhwc, (x_i8_nhwc, w_i8_hwio), flops_conv),
        ("conv_i8_9dot", conv_i8_9dot, (x_i8_nhwc, w_i8_hwio), flops_conv),
        ("dynquant", dynquant, (x_bf,), 0),
        ("epilogue", epilogue, (jnp.zeros((B, C, H, W), jnp.int32),), 0),
    ]:
        try:
            t = timeit(fn, *args)
            rate = flops / t / 1e12 if flops else 0
            print(f"{name:20s}: {t*1e3:7.2f} ms   {rate:6.1f} T/s")
        except Exception as e:
            print(f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:200]}")


# ----------------------------------------------------------------- probe: dot


def probe_dot():
    """Pure dot_general rates at tower GEMM shapes (r2 probe 2)."""
    key = jax.random.PRNGKey(0)
    M = 1 << 19
    for k_, n_ in [(1152, 128), (1152, 256), (128, 128), (128, 256),
                   (576, 128), (2304, 256)]:
        for dt in (jnp.int8, jnp.bfloat16):
            a = _mk(key, (M, k_), dt)
            b = _mk(key, (k_, n_), dt)
            pref = jnp.int32 if dt == jnp.int8 else jnp.float32

            def f(a, b, pref=pref):
                return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                           preferred_element_type=pref)
            try:
                t = timeit(jax.jit(f), a, b)
                rate = 2 * M * k_ * n_ / t / 1e12
                print(f"dot M={M} K={k_:5d} N={n_:3d} "
                      f"{np.dtype(dt).name}: {t*1e3:7.2f} ms  "
                      f"{rate:6.1f} T/s", flush=True)
            except Exception as e:
                print(f"dot K={k_} N={n_}: FAILED {str(e)[:120]}",
                      flush=True)
            del a, b

    B, H, W, C = 8, 512, 512, 128
    x = _mk(key, (B, C, H, W), jnp.bfloat16)
    w = _mk(key, (C, C, 3, 3), jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    fl = 2 * B * H * W * 9 * C * C
    for name, pref in [("pref_f32", jnp.float32), ("bf16out", None)]:
        def conv(x, w, pref=pref):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=pref)
        t = timeit(jax.jit(conv), x, w, n=5)
        print(f"conv bf16 B=8 128->128 {name}: {t*1e3:7.2f} ms  "
              f"{fl/t/1e12:6.1f} T/s", flush=True)


# -------------------------------------------------------------- probe: pallas


def _pallas_gemm(a, b, out_dtype, acc_dtype, tile_m=512):
    M, K = a.shape
    _, N = b.shape

    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=acc_dtype).astype(out_dtype)

    return pl.pallas_call(
        kern,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )(a, b)


def probe_pallas():
    """Pallas vs XLA GEMM at tower shapes (r2 probe 3)."""
    key = jax.random.PRNGKey(0)
    M = 1 << 20
    for K, N in [(1152, 128), (1152, 256), (1152, 512)]:
        fl = 2 * M * K * N
        a8, b8 = _mk(key, (M, K), jnp.int8), _mk(key, (K, N), jnp.int8)
        for tile_m in (256, 512, 1024):
            try:
                f = jax.jit(partial(_pallas_gemm, out_dtype=jnp.int32,
                                    acc_dtype=jnp.int32, tile_m=tile_m))
                t = timeit(f, a8, b8, n=30)
                print(f"pallas i8  K={K} N={N} tm={tile_m}: {t*1e3:6.2f} ms "
                      f"{fl/t/1e12:6.1f} T/s", flush=True)
            except Exception as e:
                print(f"pallas i8  K={K} N={N} tm={tile_m}: FAIL "
                      f"{str(e)[:100]}", flush=True)
        abf = _mk(key, (M, K), jnp.bfloat16)
        bbf = _mk(key, (K, N), jnp.bfloat16)
        try:
            f = jax.jit(partial(_pallas_gemm, out_dtype=jnp.bfloat16,
                                acc_dtype=jnp.float32, tile_m=512))
            t = timeit(f, abf, bbf, n=30)
            print(f"pallas bf16 K={K} N={N} tm=512: {t*1e3:6.2f} ms "
                  f"{fl/t/1e12:6.1f} T/s", flush=True)
        except Exception as e:
            print(f"pallas bf16 K={K} N={N}: FAIL {str(e)[:100]}",
                  flush=True)

        @jax.jit
        def xla8(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
        t = timeit(xla8, a8, b8, n=30)
        print(f"xla    i8  K={K} N={N}: {t*1e3:6.2f} ms "
              f"{fl/t/1e12:6.1f} T/s", flush=True)

        @jax.jit
        def xlabf(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32
                                       ).astype(jnp.bfloat16)
        t = timeit(xlabf, abf, bbf, n=30)
        print(f"xla   bf16 K={K} N={N}: {t*1e3:6.2f} ms "
              f"{fl/t/1e12:6.1f} T/s", flush=True)
        del a8, b8, abf, bbf


# --------------------------------------------------------------- probe: chain


def _chained(x, ws, depth, tile_m, dt, acc_dt):
    M, C = x.shape

    def kern(x_ref, w_ref, o_ref):
        y = x_ref[:]
        for i in range(depth):
            acc = jnp.dot(y, w_ref[i], preferred_element_type=acc_dt)
            if dt == jnp.int8:
                y = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
            else:
                y = jnp.maximum(acc, 0).astype(dt)
        o_ref[:] = y

    return pl.pallas_call(
        kern,
        grid=(M // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((depth, C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), dt),
    )(x, ws)


def probe_chain():
    """Chained VMEM-resident N=128 dots — the fused-tower ceiling (r2
    probe 4)."""
    key = jax.random.PRNGKey(0)
    M, C, DEPTH = 1 << 20, 128, 8
    fl = 2 * M * C * C * DEPTH
    for dt, acc in [(jnp.int8, jnp.int32), (jnp.bfloat16, jnp.float32)]:
        x = _mk(key, (M, C), dt)
        ws = _mk(key, (DEPTH, C, C), dt)
        for tm in (512, 1024, 2048, 4096):
            try:
                f = jax.jit(partial(_chained, depth=DEPTH, tile_m=tm, dt=dt,
                                    acc_dt=acc))
                t = timeit(f, x, ws, n=30)
                print(f"chain {np.dtype(dt).name:8s} tm={tm:5d}: "
                      f"{t*1e3:6.2f} ms {fl/t/1e12:6.1f} T/s", flush=True)
            except Exception as e:
                print(f"chain {np.dtype(dt).name} tm={tm}: FAIL "
                      f"{str(e)[:120]}", flush=True)
    a8 = _mk(key, (M, 1152), jnp.int8)
    b8 = _mk(key, (1152, 128), jnp.int8)

    def gemm_out8(a, b):
        def kern(a_ref, b_ref, o_ref):
            acc = jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.int32)
            o_ref[:] = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
        return pl.pallas_call(
            kern, grid=(M // 2048,),
            in_specs=[pl.BlockSpec((2048, 1152), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((1152, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2048, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int8))(a, b)
    t = timeit(jax.jit(gemm_out8), a8, b8, n=30)
    print(f"gemm K=1152 N=128 i8->i8 out: {t*1e3:6.2f} ms "
          f"{2*M*1152*128/t/1e12:6.1f} T/s", flush=True)


PROBES = {"conv": probe_conv, "dot": probe_dot, "pallas": probe_pallas,
          "chain": probe_chain}


if __name__ == "__main__":
    PROBES[sys.argv[1] if len(sys.argv) > 1 else "conv"]()
