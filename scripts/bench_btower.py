"""Microbench: streaming bf16 Pallas paired tower (ops/btower) vs the XLA
paired tower at the flagship step shapes.

Usage: python scripts/bench_btower.py [batch] [step]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.flow import subnets as fs
from cwfa_tpu.models.cwf import pair_tower_params
from cwfa_tpu.ops import btower


def timeit(fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    steps = [int(sys.argv[2])] if len(sys.argv) > 2 else [0, 1, 2, 3]
    H = W = 512
    key = jax.random.PRNGKey(0)
    for k in steps:
        n = 96 // (2 ** (k + 1))          # c_flow at step k
        cin, nout = n, 4 * n
        ka, kb, kx = jax.random.split(jax.random.fold_in(key, k), 3)
        pa = fs.init_wavelet_flow_subnet2d(ka, cin, 2 * n, n_ch=64)
        pb = fs.init_wavelet_flow_subnet2d(kb, cin, 2 * n, n_ch=64)
        paired = jax.tree_util.tree_map(
            lambda v: v, pair_tower_params(pa, pb))
        x = jax.random.normal(kx, (batch, cin, H, W), jnp.bfloat16)

        params_bf = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16), paired)

        @jax.jit
        def xla_tower(p, v):
            return fs.wavelet_flow_subnet2d(p, v)

        t = timeit(xla_tower, params_bf, x)
        flops = 2 * batch * H * W * 128 * (cin + 9 * 128 * 3 + 128 * 3
                                           + 9 * nout)
        print(f"step{k} B={batch} XLA bf16 tower: {t*1e3:7.2f} ms "
              f"({t*1e3/batch:5.2f} ms/frame, {flops/t/1e12:5.1f} TF/s)",
              flush=True)

        wp = btower.pack_pair_tower_bf16(paired)
        xp = jax.jit(btower.prep_input_bf16)(x)
        for tw in (256, 128, 64):
            for taps in ("dots", "patch"):
                try:
                    f = jax.jit(lambda xp, wp, tw=tw, taps=taps:
                                btower.fused_pair_tower_bf16(
                                    xp, wp, h=H, w=W, th=8, tw=tw,
                                    taps_mode=taps))
                    t = timeit(f, xp, wp)
                    print(f"step{k} B={batch} btower tw={tw} {taps}: "
                          f"{t*1e3:7.2f} ms ({t*1e3/batch:5.2f} ms/frame, "
                          f"{flops/t/1e12:5.1f} TF/s)", flush=True)
                except Exception as e:
                    print(f"step{k} btower tw={tw} {taps}: FAIL "
                          f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
