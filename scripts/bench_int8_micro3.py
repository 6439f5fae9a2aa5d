"""Probe 3: Pallas int8 vs bf16 GEMM at the tower-conv shapes, with enough
repeats to amortize the 0.2-2.5 ms dispatch overhead.

GEMM shape: (M, K) @ (K, N), M = B*H*W rows of im2col patches.
Tower conv: K = 1152 (9*128), N = 128 per pair (N = 256 if s|t towers of two
pairs share an input... they don't; N=128 is the real shape).
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=30):
    out = fn(*args)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / n


@partial(jax.jit, static_argnums=1)
def _mk_i8(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


@partial(jax.jit, static_argnums=(1, 2))
def _mk(key, shape, dt):
    return jax.random.normal(key, shape, dt)


def pallas_gemm(a, b, out_dtype, acc_dtype, tile_m=512):
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


def main():
    key = jax.random.PRNGKey(0)
    M = 1 << 20
    for K, N in [(1152, 128), (1152, 256), (1152, 512)]:
        fl = 2 * M * K * N
        # pallas int8
        a8, b8 = _mk_i8(key, (M, K)), _mk_i8(key, (K, N))
        for tile_m in (256, 512, 1024):
            try:
                f = jax.jit(partial(pallas_gemm, out_dtype=jnp.int32,
                                    acc_dtype=jnp.int32, tile_m=tile_m))
                t = timeit(f, a8, b8)
                print(f"pallas i8  K={K} N={N} tm={tile_m}: {t*1e3:6.2f} ms "
                      f"{fl/t/1e12:6.1f} T/s", flush=True)
            except Exception as e:
                print(f"pallas i8  K={K} N={N} tm={tile_m}: FAIL "
                      f"{str(e)[:100]}", flush=True)
        # pallas bf16
        abf, bbf = _mk(key, (M, K), jnp.bfloat16), _mk(key, (K, N), jnp.bfloat16)
        try:
            f = jax.jit(partial(pallas_gemm, out_dtype=jnp.bfloat16,
                                acc_dtype=jnp.float32, tile_m=512))
            t = timeit(f, abf, bbf)
            print(f"pallas bf16 K={K} N={N} tm=512: {t*1e3:6.2f} ms "
                  f"{fl/t/1e12:6.1f} T/s", flush=True)
        except Exception as e:
            print(f"pallas bf16 K={K} N={N}: FAIL {str(e)[:100]}", flush=True)
        # XLA dots, amortized properly
        @jax.jit
        def xla8(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
        t = timeit(xla8, a8, b8)
        print(f"xla    i8  K={K} N={N}: {t*1e3:6.2f} ms {fl/t/1e12:6.1f} T/s",
              flush=True)

        @jax.jit
        def xlabf(a, b):
            return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32
                                       ).astype(jnp.bfloat16)
        t = timeit(xlabf, abf, bbf)
        print(f"xla   bf16 K={K} N={N}: {t*1e3:6.2f} ms {fl/t/1e12:6.1f} T/s",
              flush=True)
        del a8, b8, abf, bbf


if __name__ == "__main__":
    main()
