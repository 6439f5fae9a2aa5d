"""Measure the fused cond-pair Pallas kernel (ops/cond_pair.py) against the
shipped XLA depthbatch form at flagship shapes — VERDICT round-3 item 1:
'build and measure the fused VMEM cond-pair kernel, stop modeling it'.

Usage: python scripts/bench_cond_pair.py [D] [H] [batch] [th]
Writes nothing; prints the measured table for docs/PERFORMANCE.md."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.utils.compile_cache import enable_compile_cache
from cwfa_tpu import nn as cnn
from cwfa_tpu.models.cond_net import (_conv3d_pair_depthbatch,
                                      init_cond_network)
from cwfa_tpu.ops import cond_pair


def timeit(f, *a, n=10):
    o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    np.asarray(jax.tree_util.tree_leaves(o)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    enable_compile_cache()
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    th = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    w = h
    key = jax.random.PRNGKey(0)
    p = init_cond_network(key, 3, d)
    p = {"c3a": p["c3a"], "c3b": p["c3b"], "prelu": p["prelu"]}
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, d, h, w),
                          jnp.float32)
    act = lambda u: cnn.prelu(p["prelu"], u)
    true_gf = batch * d * h * w * 32 * 27 * 2 * 2 / 1e9

    t0 = time.perf_counter()
    fk = jax.jit(lambda x: cond_pair.cond_pair_fused(x, p, th=th))
    out = fk(x)
    np.asarray(out.ravel()[:1])
    print(f"kernel compile+1st: {time.perf_counter()-t0:.1f}s", flush=True)
    # correctness spot-check on-device
    want = _conv3d_pair_depthbatch(p, x[:1], act, 0.0, None)
    dmax = float(jnp.max(jnp.abs(out[:1] - want)))
    sc = float(jnp.max(jnp.abs(want)))
    print(f"on-device max|diff| vs oracle: {dmax:.3e} (scale {sc:.2f})",
          flush=True)

    dt = timeit(fk, x)
    print(f"fused Pallas pair  D={d} b{batch} th={th}: {dt*1e3:8.2f} ms "
          f"({dt*1e3/batch:7.2f} ms/frame-net, {true_gf/dt/1e3:5.2f} TF/s "
          f"on true flops)", flush=True)

    fx = jax.jit(lambda x: _conv3d_pair_depthbatch(
        p, x.astype(jnp.bfloat16), act, 0.0, None))
    dt2 = timeit(fx, x)
    print(f"XLA depthbatch     D={d} b{batch}      : {dt2*1e3:8.2f} ms "
          f"({dt2*1e3/batch:7.2f} ms/frame-net, {true_gf/dt2/1e3:5.2f} TF/s)",
          flush=True)


if __name__ == "__main__":
    main()
