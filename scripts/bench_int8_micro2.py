"""Probe 2: pure dot_general rates at the tower-conv GEMM shapes.

All operands generated ON DEVICE (host->device upload through the remote
tunnel is far too slow for GB-scale operands).

The tower conv as GEMM: M = B*H*W (spatial), K = 9*C_in (im2col) or C_in
(per-tap), N = C_out.
"""
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


from functools import partial
@partial(jax.jit, static_argnums=1)
def _mk_i8(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


@partial(jax.jit, static_argnums=1)
def _mk_bf(key, shape):
    return jax.random.normal(key, shape, jnp.bfloat16)


def main():
    key = jax.random.PRNGKey(0)
    M = 1 << 19   # 512K rows = B=2 x 512^2; enough to saturate
    for k_, n_ in [(1152, 128), (1152, 256), (128, 128), (128, 256),
                   (576, 128), (2304, 256)]:
        for dt in ("int8", "bf16"):
            mk = _mk_i8 if dt == "int8" else _mk_bf
            a = mk(key, (M, k_))
            b = mk(key, (k_, n_))
            pref = jnp.int32 if dt == "int8" else jnp.float32

            def f(a, b):
                return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                           preferred_element_type=pref)
            f = jax.jit(f)
            try:
                t = timeit(f, a, b)
                rate = 2 * M * k_ * n_ / t / 1e12
                print(f"dot M={M} K={k_:5d} N={n_:3d} {dt}: {t*1e3:7.2f} ms"
                      f"  {rate:6.1f} T/s", flush=True)
            except Exception as e:
                print(f"dot K={k_} N={n_} {dt}: FAILED {str(e)[:120]}",
                      flush=True)
            del a, b

    # batch-8 conv reference point (reconcile with round-1 note of 66 TF/s)
    B, H, W, C = 8, 512, 512, 128
    x = _mk_bf(key, (B, C, H, W))
    w = _mk_bf(key, (C, C, 3, 3))
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


if __name__ == "__main__":
    main()
