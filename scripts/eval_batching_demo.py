"""Eval-batching wall-clock artifact (VERDICT r2 #5 'Done' criterion):
time CWFATrainer.evaluate at batch_size 1 vs 8 on the same trained-ish
model and dataset, mid-scale on TPU.

Usage: python scripts/eval_batching_demo.py | tee docs/results/eval_batching_r3.log
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses as dc

    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_synthetic_dataset, make_view_indices)
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    nd, vs, img, nl, nframes = 16, 64, 192, 9, 16
    root = tempfile.mkdtemp(prefix="evalbatch_")
    info = make_synthetic_dataset(root, n_fish=1, n_frames=nframes,
                                  n_depths=nd, vol_side=vs, img_size=img,
                                  n_lenslets=nl, view_size=vs)
    ds = load_xlfm_data(info["fish_dirs"][0] + "/SLNet_preprocessed",
                        info["lenslet_file"], vol_shape=(vs, vs, nd),
                        img_shape=(img, img),
                        images_to_use=list(range(nframes)),
                        n_depths_to_fill=nd, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    base = CWFAConfig(
        n_depths=nd, volume_side_size=vs, n_lenslets=nl,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=16,
        INN_cond_chans=8, epochs=8, eval_every=10 ** 9,
        save_tiff_volumes=0, lenslet_file=info["lenslet_file"]).decode_lrs()
    vidx = make_view_indices(ds.lenslet_coords, (img, img), (vs, vs))
    stats = cat.get_statistics()

    results = {}
    for bs in (1, 8):
        cfg = dc.replace(base, batch_size=bs)
        tr = CWFATrainer(CWFAModel.build(cfg), stats, vidx, seed=11)
        tr.ensure_mean_caches(cat)
        tr.evaluate(cat, "val", save_volumes=False)     # compile + cache
        t0 = time.time()
        res = tr.evaluate(cat, "val", save_volumes=False)
        wall = time.time() - t0
        results[bs] = wall
        print(f"batch_size={bs}: evaluate({nframes} frames) wall "
              f"{wall:.2f}s  ({wall/nframes*1e3:.0f} ms/frame incl. host "
              f"metrics; device time/mean {np.mean(res['times'])*1e3:.1f} "
              f"ms/frame)", flush=True)
    print(f"speedup batch 8 vs 1: {results[1]/results[8]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
