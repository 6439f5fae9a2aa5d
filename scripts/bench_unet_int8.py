"""Does XLA int8 conv beat bf16 at the LRNN UNet's shapes (256-1024 ch)?"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    np.asarray(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(out.ravel()[:1])
    return (time.perf_counter() - t0) / n


def conv(x, w, ptype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=ptype)


def main():
    key = jax.random.PRNGKey(0)
    for (c_in, c_out, hw) in [(256, 256, 512), (512, 512, 256),
                              (1024, 1024, 128)]:
        b = 8
        x = jax.random.normal(key, (b, c_in, hw, hw), jnp.bfloat16)
        w = jax.random.normal(key, (c_out, c_in, 3, 3), jnp.bfloat16) * 0.05
        f_bf = jax.jit(lambda x, w: conv(x, w, jnp.float32))
        t_bf = timeit(f_bf, x, w)
        gf = 2 * b * hw * hw * c_in * c_out * 9 / 1e12
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 32), -127,
                      127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 600), -127,
                      127).astype(jnp.int8)
        f_i8 = jax.jit(lambda x, w: conv(x, w, jnp.int32))
        t_i8 = timeit(f_i8, xq, wq)
        print(f"{c_in}->{c_out}@{hw}^2: bf16 {t_bf*1e3:7.2f} ms "
              f"({gf/t_bf:6.1f} TF/s)   int8 {t_i8*1e3:7.2f} ms "
              f"({gf/t_i8:6.1f} TOP/s)", flush=True)


if __name__ == "__main__":
    main()
