"""Does XLA's own int8 conv lowering beat bf16 at the tower shapes?
Times the jitted int8 oracle (quantized_pair_tower_reference) vs the bf16
paired tower at step-0 flagship shape, plus the new fused kernel."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.ops import qtower
from cwfa_tpu.flow import subnets as fs

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

    # bf16 XLA tower
    pb = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16), paired)

    @jax.jit
    def f_bf16(xb):
        return fs.wavelet_flow_subnet2d(pb, xb.astype(jnp.bfloat16))
    t = timeit(f_bf16, xb)
    print(f"bf16 XLA tower      : {t*1e3:8.2f} ms ({t*1e3/B:6.2f} ms/f)",
          flush=True)

    # int8 XLA oracle
    @jax.jit
    def f_i8(xb):
        xq = jnp.clip(jnp.round(
            xb / scales[0, :CIN][None, :, None, None]),
            -127, 127).astype(jnp.int8)
        return qtower.quantized_pair_tower_reference(qw, scales, xq)
    t = timeit(f_i8, xb)
    print(f"int8 XLA oracle     : {t*1e3:8.2f} ms ({t*1e3/B:6.2f} ms/f)",
          flush=True)

    # fused kernel (current)
    @jax.jit
    def f_kern(xb):
        xq = qtower.quantize_input(xb, scales[0])
        return qtower.fused_pair_tower(xq, qw, scales, h=H, w=W)
    t = timeit(f_kern, xb)
    print(f"fused int8 kernel   : {t*1e3:8.2f} ms ({t*1e3/B:6.2f} ms/f)",
          flush=True)


if __name__ == "__main__":
    main()
