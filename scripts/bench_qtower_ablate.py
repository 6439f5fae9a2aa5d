"""Direct fused_pair_tower timing at the step-0 flagship shape with
component ablations, to locate the non-MXU overhead.

Shapes: x (8, 48, 512, 512) -> out (8, 512, 512, 192), c=128.
MXU-only theoretical at ~100 TF/s int8: ~5 ms per call (8 frames).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.ops import qtower

B, CIN, H, W, C, NOUT = 8, 48, 512, 512, 128, 192


def timeit(fn, *args, n=8):
    out = fn(*args)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 20)
    ki = iter(ks)
    conv = lambda o, i, k: {
        "w": jax.random.normal(next(ki), (o, i, k, k), jnp.float32) * 0.05,
        "b": jax.random.normal(next(ki), (o,), jnp.float32) * 0.05}
    paired = {"b1": conv(C, CIN, 1), "b2a": conv(C, C, 3),
              "b2b": conv(C, C, 1), "b4a": conv(C, C, 3),
              "b4b": conv(C, C, 1), "b6a": conv(C, C, 3),
              "b6b": conv(C, C, 1), "b7": conv(NOUT, C, 3)}
    x = jax.random.normal(key, (2, CIN, H, W), jnp.float32)
    scales = jax.jit(qtower.pair_tower_calibrate)(paired, x)
    qw = jax.jit(qtower.quantize_pair_tower)(paired, scales)
    xb = jax.random.normal(key, (B, CIN, H, W), jnp.float32)
    xq = jax.jit(qtower.quantize_input)(xb, scales[0])
    jax.block_until_ready(xq)

    variants = [(), ("noelu",), ("nomask",), ("noroll",),
                ("noelu", "nomask"), ("noelu", "nomask", "noroll"),
                ("noelu", "nomask", "noroll", "noquant")]
    for ab in variants:
        f = jax.jit(lambda xq, ab=ab: qtower.fused_pair_tower(
            xq, qw, scales, h=H, w=W, ablate=ab))
        t = timeit(f, xq)
        print(f"ablate={','.join(ab) or 'none':32s}: {t*1e3:8.2f} ms"
              f"  ({t*1e3/B:6.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
