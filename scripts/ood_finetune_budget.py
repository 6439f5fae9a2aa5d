"""Measure the OOD finetune budget at FLAGSHIP scale on the live chip.

The reference's flagship claim is "~5 minutes of retraining" when a novel
sample is detected (/root/reference/README.md:22).  Round 1 priced the TPU
equivalent at ~2 min from per-step times alone; this script MEASURES the
actual protocol wall-clock (VERDICT round-3 item 5): 50 novel frames x all
5 pyramid steps x 2 epochs through the real `finetune_on_novel` loop
(engine/ood.py) with the shipped bf16-AMP paths.

The 50-frame novel dataset is synthesized in memory (random volumes/frames
at full 512x512x96 + 2160^2 camera scale): finetune cost is architecture-
bound, not content-bound, and generating physically-formed flagship images
would take hours on this rig's single CPU core.  TIFF ingest is excluded —
it is the same cost for reference and rebuild and is measured separately
(native loader, data/native_tiff.py).

Usage: python scripts/ood_finetune_budget.py [n_frames] [batch_size]
Output: docs/results/ood_finetune_r4.log
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inmem_dataset(cfg, img: int, n_frames: int, seed: int = 0):
    """A flagship-shaped XLFMDataset without disk IO: the attribute set of
    XLFMDataset.__init__ (data/dataset.py:93-161), filled with random
    content (budget measurement rig — not a data path)."""
    from cwfa_tpu.data.dataset import XLFMDataset

    rng = np.random.RandomState(seed)
    side = cfg.volume_side_size
    g = int(np.ceil(np.sqrt(cfg.n_lenslets)))
    half = side // 2
    xs = np.linspace(half, img - half, g).astype(np.int64)
    coords = np.array([(x, y) for x in xs for y in xs][:cfg.n_lenslets])

    ds = XLFMDataset.__new__(XLFMDataset)
    ds.data_path = "<in-memory>"
    ds.dataset_id = "novel"
    ds.lenslet_coords = coords
    ds.n_lenslets = len(coords)
    ds.img_shape = (img, img)
    ds.load_vols = True
    ds.gt_cache = []
    ds.n_images = n_frames
    ds.images_to_use = list(range(n_frames))
    ds.stacked_views = (rng.rand(n_frames, img, img).astype(np.float32)
                        * 1000)
    ds.vols = np.abs(rng.randn(n_frames, cfg.n_depths, side, side)
                     .astype(np.float32)) * 50
    return ds


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data.dataset import ConcatXLFMDataset
    from cwfa_tpu.data.stats import DatasetStatistics
    from cwfa_tpu.data.views import make_view_indices
    from cwfa_tpu.engine.ood import detect_ood, finetune_on_novel
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    img = 2160
    stats = DatasetStatistics(100.0, 50.0, 100.0, 50.0, 10.0, 5.0)
    cfg = CWFAConfig(use_half_precision=True, batch_size=batch).decode_lrs()
    model = CWFAModel.build(cfg)

    t0 = time.time()
    ds = build_inmem_dataset(cfg, img, n_frames)
    novel = ConcatXLFMDataset(ds)
    side = cfg.volume_side_size
    vidx = make_view_indices(ds.lenslet_coords, (img, img), (side, side))
    print(f"dataset built in {time.time()-t0:.0f}s "
          f"({ds.vols.nbytes/2**30:.1f} GiB vols)", flush=True)

    t0 = time.time()
    trainer = CWFATrainer(model, stats, vidx)
    print(f"trainer init (incl. jit builds) {time.time()-t0:.0f}s",
          flush=True)

    # detection pass (the part that triggers the finetune)
    t0 = time.time()
    det = detect_ood(trainer, novel)
    t_detect = time.time() - t0
    print(f"detect_ood over {n_frames} frames: {t_detect:.1f}s "
          f"({n_frames/t_detect:.1f} frames/s)", flush=True)

    # THE protocol: 50 frames x 5 steps x 2 epochs
    t0 = time.time()
    finetune_on_novel(trainer, novel, optimize_steps=(1, 2, 3, 4, 5),
                      epochs_per_step=2, verbose=True)
    t_ft = time.time() - t0

    nsteps = trainer.model.n_flow_steps + 1
    lines = [
        f"OOD finetune budget, round 4 (flagship 512x512x96, 2160^2 "
        f"camera, bf16-AMP, batch_size={batch}, one v5e chip)",
        f"protocol: {n_frames} frames x {nsteps} pyramid steps x 2 epochs "
        "(reference README.md:22 '~5 minutes of retraining')",
        f"detect_ood: {t_detect:.1f}s ({n_frames/t_detect:.2f} frames/s)",
        f"finetune wall: {t_ft:.1f}s ({t_ft/60:.2f} min) vs reference "
        f"~5 min -> {300.0/t_ft:.2f}x",
        f"per frame-step-epoch: {t_ft/(n_frames*nsteps*2)*1e3:.0f} ms "
        f"(50-frame protocol extrapolation: "
        f"{t_ft/(n_frames*nsteps*2)*50*nsteps*2/60:.2f} min)",
        "(synthetic in-memory frames; TIFF ingest excluded — see module "
        "docstring.  NOTE this rig feeds the chip through the axon tunnel; "
        "host->device upload is tunnel-limited, so the wall time is an "
        "UPPER bound vs a host-attached TPU's PCIe feeding)",
    ]
    out = "\n".join(lines) + "\n"
    print(out, flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "results",
        "ood_finetune_r4.log")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
