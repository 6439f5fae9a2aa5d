"""int8 fused-tower profile at flagship shapes: per-step tower timing
(bf16 XLA paired vs int8 Pallas fused) + full int8 reconstructor fps."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.data.views import make_view_indices
from cwfa_tpu.engine.inference import XLFMReconstructor
from cwfa_tpu.models.cwfa_model import CWFAModel
from cwfa_tpu.models.cwf import _cat_block_st
from cwfa_tpu.models.cond_net import cond_networks_batched


def timeit(fn, *args, n=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    skip_full = len(sys.argv) > 2 and sys.argv[2] == "nofull"
    cfg = CWFAConfig().decode_lrs()
    img = 2160
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    stats = DatasetStatistics(100.0, 50.0, 100.0, 50.0, 10.0, 5.0)
    side = cfg.volume_side_size
    g = int(np.ceil(np.sqrt(cfg.n_lenslets)))
    half = side // 2
    xs = np.linspace(half, img - half, g).astype(np.int64)
    coords = np.array([(x, y) for x in xs for y in xs][:cfg.n_lenslets])
    vidx = make_view_indices(coords, (img, img), (side, side))
    nf = model.n_flow_steps
    key = jax.random.PRNGKey(1)
    mean_caches = [jax.random.normal(
        jax.random.fold_in(key, k),
        (1, cfg.n_depths // (2 ** (k + 1)), side, side)) for k in range(nf + 1)]

    dt = jnp.bfloat16 if cfg.use_half_precision else jnp.float32
    frames = jax.random.uniform(key, (batch, img, img), jnp.float32) * 1000
    views_n = jax.random.normal(key, (batch, cfg.n_lenslets, side, side), dt)

    print("quantizing...", flush=True)
    qpacks = model.quantize_steps(params, views_n)
    cvs = jax.jit(cond_networks_batched)(params["cond"], views_n)
    jax.block_until_ready(cvs)
    print("quantized", flush=True)

    for k in range(nf):
        spec = model.step_specs[k]

        def f_tow(cv, k=k, spec=spec):
            return _cat_block_st(spec, params["flow"][k], cv)

        def f_towq(cv, k=k, spec=spec):
            return _cat_block_st(spec, params["flow"][k], cv,
                                 qpack=qpacks[k])
        t_b = timeit(jax.jit(f_tow), cvs[k])
        t_q = timeit(jax.jit(f_towq), cvs[k])
        print(f"towers[{k}]  bf16: {t_b*1e3:8.2f} ms ({t_b*1e3/batch:6.2f}"
              f" ms/f)   int8: {t_q*1e3:8.2f} ms ({t_q*1e3/batch:6.2f} ms/f)",
              flush=True)

    if skip_full:
        return
    recon8 = XLFMReconstructor(model, params, mstate, stats, vidx,
                               mean_caches, deterministic=True,
                               compute_dtype=dt, use_int8=True,
                               calib_frames=frames)
    recon8.warmup(batch, (img, img))
    fps8 = recon8.throughput(frames, n_repeats=5)
    print(f"FULL int8: {1e3/fps8:.2f} ms/frame   fps_int8 = {fps8:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
