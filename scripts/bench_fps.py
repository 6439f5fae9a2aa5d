"""Quick full-pipeline fps at a given batch (default 8) on TPU.
Usage: python scripts/bench_fps.py [batch] [--int8]"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.data.views import make_view_indices
from cwfa_tpu.engine.inference import XLFMReconstructor
from cwfa_tpu.models.cwfa_model import CWFAModel


def main():
    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    args = [a for a in sys.argv[1:]]
    batch = int(args[0]) if args and args[0].isdigit() else 8
    use_int8 = "--int8" in args
    cfg = CWFAConfig().decode_lrs()
    if "--forceall" in args:
        # ablation: zero-views conditions — the cond nets drop out of the
        # program entirely, so (normal - forceall) = their true marginal
        # in-program cost (isolated jits overestimate ~25-40%)
        import dataclasses as _dc
        cfg = _dc.replace(cfg, force_all_steps_NF=1)
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
    use_pallas = "--pallas" in args
    pair = ("hoist" if "--hoist" in args else
            "mid" if "--mid" in args else
            True if "--pair" in args else
            "tail" if "--tail" in args else
            False if "--nopair" in args else "mid")
    recon = XLFMReconstructor(model, params, mstate, stats, vidx, mean_caches,
                              deterministic=True, compute_dtype=dt,
                              use_int8=use_int8, use_pallas=use_pallas,
                              calib_frames=frames if use_int8 else None,
                              pair_input_towers=pair)
    recon.warmup(batch, (img, img))
    fps = recon.throughput(frames, n_repeats=5)
    print(f"batch={batch} int8={use_int8} pair={pair} pallas={use_pallas}: "
          f"{1e3/fps:.2f} ms/frame  fps = {fps:.2f}", flush=True)


if __name__ == "__main__":
    main()
