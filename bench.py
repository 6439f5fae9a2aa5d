"""Headline benchmark: 512x512x96 XLFM reconstruction frames/sec on one chip.

Baseline: the PyTorch reference reconstructs one frame in ~0.16 s on GPU
(reference README.md:29) = 6.25 fps; the driver north star is >=25 fps/chip
(BASELINE.md).  vs_baseline = fps / 6.25.

The measured program is the full production path: raw 2160^2 camera frame ->
29 lenslet views -> normalize -> LRNN (UNet + ConvNeXt mean-volume prior) ->
4 inverse CWF steps -> un-normalized 512x512x96 volume, one jitted XLA
program in bf16 compute / fp32 accumulation, batched over frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data.stats import DatasetStatistics
    from cwfa_tpu.data.views import make_view_indices
    from cwfa_tpu.engine.inference import XLFMReconstructor
    from cwfa_tpu.models.cwfa_model import CWFAModel

    cfg = CWFAConfig().decode_lrs()       # flagship: 512x512x96, CAT x4, 64ch
    img = 2160
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    stats = DatasetStatistics(100.0, 50.0, 100.0, 50.0, 10.0, 5.0)

    rng = np.random.RandomState(0)
    side = cfg.volume_side_size
    g = int(np.ceil(np.sqrt(cfg.n_lenslets)))
    half = side // 2
    xs = np.linspace(half, img - half, g).astype(np.int64)
    coords = np.array([(x, y) for x in xs for y in xs][:cfg.n_lenslets])
    vidx = make_view_indices(coords, (img, img), (side, side))

    nf = model.n_flow_steps
    mean_caches = [jnp.asarray(rng.randn(
        1, cfg.n_depths // (2 ** (k + 1)), side, side).astype(np.float32))
        for k in range(nf + 1)]

    compute_dtype = jnp.bfloat16 if cfg.use_half_precision else jnp.float32

    import gc
    best_fps = 0.0
    # batch 4 first: historically the sweet spot; batch 8 compiles
    # intermittently hit the HBM ceiling on this chip
    for batch in (4, 8, 1):
        gc.collect()
        try:
            recon = XLFMReconstructor(
                model, params, mstate, stats, vidx, mean_caches,
                deterministic=True, compute_dtype=compute_dtype)
            frames = jnp.asarray(
                rng.rand(batch, img, img).astype(np.float32) * 1000)
            recon.warmup(batch, (img, img))
            fps_mean, fps_min = recon.throughput(frames, n_repeats=5)
            print(f"# batch={batch}: {fps_mean:.2f} fps (mean), "
                  f"{fps_min:.2f} fps (best)", file=sys.stderr)
            best_fps = max(best_fps, fps_mean)
        except Exception as e:  # OOM at large batch -> try smaller
            print(f"# batch={batch} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        if best_fps > 0 and batch >= 8:
            break
    print(json.dumps({
        "metric": "recon_fps_512x512x96",
        "value": round(best_fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(best_fps / 6.25, 3),
    }))


if __name__ == "__main__":
    main()
