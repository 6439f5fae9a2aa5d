"""Config-5 milestone demo: OOD detection by exact likelihood + fast finetune.

Trains on fish 0 only, scores both fish (fish 1 is out-of-distribution),
runs the finetune loop on fish 1, and re-scores — the reference's flagship
workflow (README.md:22, SURVEY.md §5.9) end-to-end on TPU.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_synthetic_dataset, make_view_indices)
    from cwfa_tpu.engine.ood import detect_ood, finetune_on_novel
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    nd, vs, img, nl = 16, 64, 192, 9
    root = tempfile.mkdtemp(prefix="ood_demo_")
    info = make_synthetic_dataset(root, n_fish=2, n_frames=6, n_depths=nd,
                                  vol_side=vs, img_size=img, n_lenslets=nl,
                                  view_size=vs, seed=3)
    dss = [load_xlfm_data(fd + "/SLNet_preprocessed", info["lenslet_file"],
                          vol_shape=(vs, vs, nd), img_shape=(img, img),
                          images_to_use=list(range(6)),
                          n_depths_to_fill=nd, ds_id=f"fish{i}")
           for i, fd in enumerate(info["fish_dirs"])]
    train_ds = ConcatXLFMDataset(dss[0])
    novel_ds = ConcatXLFMDataset(dss[1])
    stats = train_ds.get_statistics()

    cfg = CWFAConfig(n_depths=nd, volume_side_size=vs, n_lenslets=nl,
                     INN_max_down_steps=4, INN_n_blocks=2,
                     INN_internal_chans=16, INN_cond_chans=8,
                     epochs=48, eval_every=48).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(dss[0].lenslet_coords, (img, img), (vs, vs))
    trainer = CWFATrainer(model, stats, vidx)

    t0 = time.time()
    for ep in range(cfg.epochs):
        loss = trainer.train_epoch(train_ds, ep)
    print(f"trained {cfg.epochs} epochs on fish0 in {time.time()-t0:.0f}s "
          f"(final loss {loss:.4f})", flush=True)

    in_dist = detect_ood(trainer, train_ds, threshold=None)
    novel = detect_ood(trainer, novel_ds, threshold=None)
    print(f"NLL in-dist (fish0): mean {in_dist.scores.mean():.3f} "
          f"{np.round(in_dist.scores, 2).tolist()}")
    print(f"NLL novel   (fish1): mean {novel.scores.mean():.3f} "
          f"{np.round(novel.scores, 2).tolist()}")
    sep = novel.scores.mean() - in_dist.scores.mean()
    print(f"separation: {sep:+.3f} (positive = novel scores higher)")

    # adaptive threshold between the two populations for the demo
    ths = float(in_dist.scores.mean() + 3 * in_dist.scores.std())
    flagged = (novel.scores > ths).sum()
    print(f"threshold mean+3std = {ths:.3f}: flags {flagged}/{len(novel.scores)} "
          f"novel frames, {(in_dist.scores > ths).sum()} in-dist frames")

    t1 = time.time()
    finetune_on_novel(trainer, novel_ds, optimize_steps=(1, 2, 3, 4),
                      epochs_per_step=3)
    ft_time = time.time() - t1
    post = detect_ood(trainer, novel_ds, threshold=None)
    print(f"finetune took {ft_time:.0f}s; novel NLL "
          f"{novel.scores.mean():.3f} -> {post.scores.mean():.3f}")
    result = {"in_dist_nll": in_dist.scores.tolist(),
              "novel_nll": novel.scores.tolist(),
              "novel_nll_after_finetune": post.scores.tolist(),
              "separation": float(sep), "finetune_seconds": ft_time}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
