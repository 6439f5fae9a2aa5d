"""Measure the v5e VPU elementwise-FMA throughput from Pallas.

The round-3 cond-pair ceiling argument (docs/PERFORMANCE.md "Round-3: the
cond nets are the floor") priced the VPU tap form of the
Conv3d(1->32)->PReLU->Conv3d(32->1) pair at an ASSUMED ~4 TF/s.  The whole
fused-kernel verdict rides on that number, so measure it: a chain of
vector multiply-adds on VMEM-resident (R, 128) f32 canvases with U
independent accumulators (ILP) repeated T times via fori_loop.

Also measures pltpu.roll (lane rotation) throughput, which the depth-on-
lanes conv_b scheme would spend 2/27 of its ops on.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fma_kernel(x_ref, y_ref, o_ref, *, t, u, mode):
    x = x_ref[...]
    y = y_ref[...]

    def body(i, accs):
        if mode == "fma":
            return tuple(a * x + y for a in accs)
        if mode == "mul":
            return tuple(a * x for a in accs)
        if mode == "roll":
            return tuple(pltpu.roll(a, 1, 1) + y for a in accs)
        raise ValueError(mode)

    accs = tuple(y * (0.5 + 0.01 * k) for k in range(u))
    accs = jax.lax.fori_loop(0, t, body, accs)
    acc = accs[0]
    for a in accs[1:]:
        acc = acc + a
    o_ref[...] = acc


def run(rows=256, t=512, u=8, mode="fma", n=20):
    x = jnp.full((rows, 128), 1.0000001, jnp.float32)
    y = jnp.full((rows, 128), 1e-9, jnp.float32)
    kern = functools.partial(fma_kernel, t=t, u=u, mode=mode)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    ))
    out = f(x, y)
    np.asarray(out[:1, :1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(x, y)
    np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / n
    # fma: mul+add = 2 flops/elem/iter/acc; mul: 1; roll: count the add only
    per = {"fma": 2, "mul": 1, "roll": 1}[mode]
    flops = rows * 128 * t * u * per
    print(f"mode={mode:5s} rows={rows} t={t} u={u}: {dt*1e6:9.1f} us  "
          f"{flops/dt/1e12:7.2f} TF/s")
    return flops / dt


if __name__ == "__main__":
    for mode in ["fma", "mul", "roll"]:
        for u in [1, 2, 4, 8, 16]:
            run(u=u, mode=mode)
