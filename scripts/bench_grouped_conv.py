"""Can a grouped conv (feature_group_count=2) compute the paired-tower
block-diagonal cores without the dense zero-block FLOPs?

Compares at the core shape (512^2 spatial, 3x3):
  a) dense block-diag 128->128 (the shipped pairing form)
  b) feature_group_count=2 conv 128->128 (same math, no zero MACs)
  c) two separate 64->64 convs
  d) one 64->64 conv at 2x batch (the 'pair in batch' form)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    B, H, W, C = (int(sys.argv[1]) if len(sys.argv) > 1 else 8), 512, 512, 64
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (B, 2 * C, H, W), jnp.bfloat16)
    xa = x2[:, :C]
    wbd = np.zeros((2 * C, 2 * C, 3, 3), np.float32)
    rng = np.random.RandomState(0)
    wa = rng.randn(C, C, 3, 3).astype(np.float32) * 0.05
    wb = rng.randn(C, C, 3, 3).astype(np.float32) * 0.05
    wbd[:C, :C] = wa
    wbd[C:, C:] = wb
    wbd = jnp.asarray(wbd, jnp.bfloat16)
    wg = jnp.asarray(np.concatenate([wa, wb], 0), jnp.bfloat16)  # (128,64,3,3)
    wa_j = jnp.asarray(wa, jnp.bfloat16)
    dn = ("NCHW", "OIHW", "NCHW")
    useful = 2 * B * H * W * 9 * C * C * 2      # two 64->64 convs

    def conv(x, w, groups=1):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=groups)

    t = timeit(jax.jit(lambda x: conv(x, wbd)), x2)
    print(f"dense block-diag 128->128 : {t*1e3:7.2f} ms "
          f"({useful/t/1e12:5.1f} useful-TF/s)", flush=True)
    t = timeit(jax.jit(lambda x: conv(x, wg, groups=2)), x2)
    print(f"grouped fg=2     128->128 : {t*1e3:7.2f} ms "
          f"({useful/t/1e12:5.1f} useful-TF/s)", flush=True)
    t = timeit(jax.jit(lambda xa, xb: (conv(xa, wa_j), conv(xb, wa_j))),
               xa, x2[:, C:])
    print(f"two separate      64->64  : {t*1e3:7.2f} ms "
          f"({useful/t/1e12:5.1f} useful-TF/s)", flush=True)
    xbt = jnp.concatenate([xa, x2[:, C:]], 0)
    t = timeit(jax.jit(lambda x: conv(x, wa_j)), xbt)
    print(f"2x batch          64->64  : {t*1e3:7.2f} ms "
          f"({useful/t/1e12:5.1f} useful-TF/s)", flush=True)


if __name__ == "__main__":
    main()
