"""Medium-scale end-to-end training validation on synthetic XLFM data.

Generates a synthetic dataset (blob volumes -> PSF projection -> camera
frames), trains the full coarse-to-fine schedule, and reports per-level PSNR
trajectories + OOD scores — the stand-in for BASELINE configs 3/4 in a
zero-egress environment (no Zenodo access).

Usage: python scripts/train_synthetic.py [--epochs 40] [--out runs/synth]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n_depths", type=int, default=32)
    ap.add_argument("--vol_side", type=int, default=64)
    ap.add_argument("--img_size", type=int, default=256)
    ap.add_argument("--n_lenslets", type=int, default=9)
    ap.add_argument("--n_frames", type=int, default=8)
    ap.add_argument("--internal_chans", type=int, default=32)
    ap.add_argument("--half", type=int, default=1,
                    help="use_half_precision (bf16 AMP steps); 0 = fp32")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_synthetic_dataset, make_view_indices)
    from cwfa_tpu.engine.ood import detect_ood
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    root = tempfile.mkdtemp(prefix="cwfa_synth_")
    info = make_synthetic_dataset(
        root, n_fish=2, n_frames=args.n_frames, n_depths=args.n_depths,
        vol_side=args.vol_side, img_size=args.img_size,
        n_lenslets=args.n_lenslets, view_size=args.vol_side)
    dss = [load_xlfm_data(fd + "/SLNet_preprocessed", info["lenslet_file"],
                          vol_shape=(args.vol_side, args.vol_side,
                                     args.n_depths),
                          img_shape=(args.img_size, args.img_size),
                          images_to_use=list(range(args.n_frames)),
                          n_depths_to_fill=args.n_depths, ds_id=f"fish{i}")
           for i, fd in enumerate(info["fish_dirs"])]
    train_ds = ConcatXLFMDataset(*dss)
    stats = train_ds.get_statistics()

    cfg = CWFAConfig(
        n_depths=args.n_depths, volume_side_size=args.vol_side,
        n_lenslets=args.n_lenslets, INN_max_down_steps=4, INN_n_blocks=4,
        INN_internal_chans=args.internal_chans, INN_cond_chans=16,
        epochs=args.epochs, eval_every=max(args.epochs // 4, 1),
        use_half_precision=args.half,
    ).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(dss[0].lenslet_coords,
                             (args.img_size, args.img_size),
                             (args.vol_side, args.vol_side))
    trainer = CWFATrainer(model, stats, vidx, output_path=args.out or None)
    counts = model.param_counts(trainer.params)
    print(f"params: {counts}", flush=True)

    t0 = time.time()
    psnr_history = []
    for epoch in range(cfg.epochs):
        loss = trainer.train_epoch(train_ds, epoch)
        stage = trainer.stage_for_epoch(epoch)
        print(f"epoch {epoch + 1}/{cfg.epochs} stage={stage} "
              f"loss={loss:.5f} ({time.time() - t0:.0f}s)", flush=True)
        if (epoch + 1) % cfg.eval_every == 0 or epoch + 1 == cfg.epochs:
            res = trainer.evaluate(train_ds, "train", epoch=epoch,
                                   save_volumes=False)
            psnrs = np.mean(res["psnr"], axis=0)
            psnr_history.append([epoch] + [float(p) for p in psnrs])
            print(f"  PSNR per level: {[f'{p:.2f}' for p in psnrs]}  "
                  f"time/frame {np.mean(res['times']):.3f}s", flush=True)

    ood = detect_ood(trainer, train_ds)
    print(f"NLL scores: {ood.scores.round(3).tolist()}")
    summary = {"psnr_history": psnr_history,
               "final_psnr": psnr_history[-1][1:],
               "nll": ood.scores.tolist(),
               "wall_time_s": time.time() - t0}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
