"""Flagship OOD detect->finetune->re-score cycle from TRAINED checkpoints,
timed end-to-end (round-4 VERDICT item 2 tail: the cycle against a held-out
"novel fish" after the full schedule; compare docs/results/ood_finetune_r4.log
where the r4 loop re-uploaded ~10x the necessary bytes and device compute
was 2.3% of the wall).

Usage: python scripts/ood_finetune_flagship.py <run_dir> <data_root> [n_frames]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    run_dir = sys.argv[1]
    data_root = sys.argv[2] if len(sys.argv) > 2 else "/root/flagship_synth"
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_view_indices)
    from cwfa_tpu.data.dataset import read_lenslet_centers
    from cwfa_tpu.engine.checkpoints import (discover_checkpoints,
                                             load_step_checkpoint)
    from cwfa_tpu.engine.ood import detect_ood, finetune_on_novel
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    # architecture + stats ride in the checkpoints
    found = discover_checkpoints(run_dir,
                                 prefix="model_step_*__ep_*.msgpack")
    if not found:
        raise SystemExit(f"no checkpoints under {run_dir}")
    _, cfg, _ = load_step_checkpoint(sorted(found.values())[0][1])
    lenslet_file = os.path.join(data_root, "lenslet_centers_python.txt")
    coords = read_lenslet_centers(lenslet_file) + 50
    img = 2160
    novel = load_xlfm_data(
        os.path.join(data_root, "fish_1", "SLNet_preprocessed"),
        lenslet_file,
        vol_shape=(cfg.volume_side_size, cfg.volume_side_size, cfg.n_depths),
        img_shape=(img, img), images_to_use=list(range(n_frames)),
        n_depths_to_fill=cfg.n_depths, ds_id="fish_1_novel")
    ds = ConcatXLFMDataset(novel)
    vidx = make_view_indices(coords, (img, img),
                             (cfg.volume_side_size, cfg.volume_side_size))

    model = CWFAModel.build(cfg)
    trainer = CWFATrainer(model, None, vidx)
    loaded = trainer.load_checkpoints(run_dir)
    print(f"loaded steps {loaded} from {run_dir}", flush=True)

    t0 = time.perf_counter()
    pre = detect_ood(trainer, ds, tag="train")
    t_detect = time.perf_counter() - t0
    print(f"detect: {int(pre.is_ood.sum())}/{len(pre.is_ood)} flagged, "
          f"scores {pre.scores.round(3).tolist()} ({t_detect:.1f}s incl. "
          "compile)", flush=True)

    xfer0 = dict(trainer.transfer_log)
    t0 = time.perf_counter()
    losses = finetune_on_novel(trainer, ds, optimize_steps=(1, 2, 3, 4, 5),
                               epochs_per_step=2, verbose=True,
                               reuse_caches=True)
    t_ft = time.perf_counter() - t0
    post = detect_ood(trainer, ds, tag="train")
    xfer1 = dict(trainer.transfer_log)
    n_steps = 5 * 2 * n_frames
    print(f"finetune: {t_ft:.1f}s for {n_frames} frames x 5 steps x 2 epochs"
          f" = {t_ft / n_steps:.3f} s/frame-step-epoch", flush=True)
    print(f"transfer during finetune+rescore: "
          f"{xfer1['volume_uploads'] - xfer0['volume_uploads']} volume "
          f"uploads, {xfer1['frame_uploads'] - xfer0['frame_uploads']} frame "
          f"uploads, {(xfer1['h2d_bytes'] - xfer0['h2d_bytes']) / 1e6:.0f} MB",
          flush=True)
    print(json.dumps({
        "scores_pre": pre.scores.tolist(),
        "scores_post": post.scores.tolist(),
        "finetune_seconds": t_ft,
        "s_per_frame_step_epoch": t_ft / n_steps,
        "detect_seconds": t_detect,
        "losses": {str(k): v for k, v in losses.items()},
        "transfer_log": xfer1,
    }), flush=True)


if __name__ == "__main__":
    main()
