"""Microbenchmark: int8 vs bf16 for the flow-tower hot conv on TPU.

Shapes: the paired CAT tower's dominant op is a 3x3 conv 128->128 at 512^2
spatial, batch B.  Candidates:
  1. bf16 conv_general_dilated (current path, ~66 TF/s measured r1)
  2. int8 conv_general_dilated with preferred_element_type=int32
  3. int8 9-shifted-dot GEMM formulation (9 x [M=B*H*W, K=128] @ [128,128])
  4. int8 im2col-free single dot with K=1152 via pre-shifted concat
Also measures the dynamic-quantization overhead (absmax + scale + round).

Timing: enqueue N executions, fetch 4 bytes of the last output (the remote
platform's block_until_ready is not a barrier; see CLAUDE.md).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

B, H, W, C = 4, 512, 512, 128
FLOPS_CONV = 2 * B * H * W * 9 * C * C


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), out)  # compile+sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
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

    # NHWC int8 variants (TPU-native layout)
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

    # 9-shifted-dot: y[b,h,w,n] = sum_{dy,dx} xpad[b,h+dy,w+dx,:] @ W[dy,dx]
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

    # dynamic per-tensor quantization overhead (bf16 in -> int8 out + scale)
    @jax.jit
    def dynquant(x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        scale = amax / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
        return q.astype(jnp.int8), scale

    # fused: dequant-scale + bias + ELU epilogue on int32 accum
    sc = jnp.float32(0.01)

    @jax.jit
    def epilogue(acc):
        return jax.nn.elu(acc.astype(jnp.float32) * sc).astype(jnp.bfloat16)

    results = {}
    for name, fn, args, flops in [
        ("conv_bf16_nchw", conv_bf16, (x_bf, w_bf), FLOPS_CONV),
        ("conv_bf16_nhwc", conv_bf16_nhwc,
         (jnp.transpose(x_bf, (0, 2, 3, 1)), jnp.transpose(w_bf, (2, 3, 1, 0))),
         FLOPS_CONV),
        ("conv_i8_nchw", conv_i8, (x_i8, w_i8), FLOPS_CONV),
        ("conv_i8_nhwc", conv_i8_nhwc, (x_i8_nhwc, w_i8_hwio), FLOPS_CONV),
        ("conv_i8_9dot", conv_i8_9dot, (x_i8_nhwc, w_i8_hwio), FLOPS_CONV),
        ("dynquant", dynquant, (x_bf,), 0),
        ("epilogue", epilogue, (jnp.zeros((B, C, H, W), jnp.int32),), 0),
    ]:
        try:
            t = timeit(fn, *args)
            rate = flops / t / 1e12 if flops else 0
            results[name] = (t * 1e3, rate)
            print(f"{name:20s}: {t*1e3:7.2f} ms   {rate:6.1f} T/s")
        except Exception as e:
            print(f"{name:20s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
