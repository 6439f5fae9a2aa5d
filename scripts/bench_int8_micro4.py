"""Probe 4: chained N=128 dots on VMEM-resident data (the fused-tower
ceiling) vs the same work as separate pallas GEMM calls.

A tower pair is ~8 chained convs at 128 wide. If the per-GEMM 85 T/s (int8)
at N=128 is pipeline/HBM-limited, a fused kernel that keeps activations in
VMEM should run the chain at a higher rate. This kernel mimics the chain:
  y = x
  for i in range(DEPTH): y = max(y @ W[i], 0)   (relu stand-in epilogue)
one M-tile per grid step, all intermediates in VMEM.
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


@partial(jax.jit, static_argnums=(1, 2))
def _mk(key, shape, dt):
    if dt == jnp.int8:
        return jax.random.randint(key, shape, -127, 128, jnp.int8)
    return jax.random.normal(key, shape, dt)


def chained(x, ws, depth, tile_m, dt, acc_dt):
    M, C = x.shape

    def kern(x_ref, w_ref, o_ref):
        y = x_ref[:]
        for i in range(depth):
            acc = jnp.dot(y, w_ref[i], preferred_element_type=acc_dt)
            # epilogue: relu + cast back to input dtype (int8: fake rescale)
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


def main():
    key = jax.random.PRNGKey(0)
    M, C, DEPTH = 1 << 20, 128, 8
    fl = 2 * M * C * C * DEPTH
    for dt, acc in [(jnp.int8, jnp.int32), (jnp.bfloat16, jnp.float32)]:
        x = _mk(key, (M, C), dt)
        ws = _mk(key, (DEPTH, C, C), dt)
        for tm in (512, 1024, 2048, 4096):
            try:
                f = jax.jit(partial(chained, depth=DEPTH, tile_m=tm, dt=dt,
                                    acc_dt=acc))
                t = timeit(f, x, ws)
                print(f"chain {np.dtype(dt).name:8s} tm={tm:5d}: "
                      f"{t*1e3:6.2f} ms {fl/t/1e12:6.1f} T/s", flush=True)
            except Exception as e:
                print(f"chain {np.dtype(dt).name} tm={tm}: FAIL "
                      f"{str(e)[:120]}", flush=True)
    # also: K=1152 single dot again but with bf16 OUT (not int32) to cut
    # output write traffic — is output dtype the limiter at N=128?
    a8 = _mk(key, (M, 1152), jnp.int8)
    b8 = _mk(key, (1152, 128), jnp.int8)

    def gemm_out8(a, b):
        def kern(a_ref, b_ref, o_ref):
            acc = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.int32)
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
    t = timeit(jax.jit(gemm_out8), a8, b8)
    print(f"gemm K=1152 N=128 i8->i8 out: {t*1e3:6.2f} ms "
          f"{2*M*1152*128/t/1e12:6.1f} T/s", flush=True)


if __name__ == "__main__":
    main()
