"""Bounded-memory evaluation artifact (VERDICT r2 #5: '250-frame eval runs
in bounded memory'): evaluate a ~120-frame dataset and report peak RSS.

At the reference's accumulate-everything shape this would hold every
GT+pred volume pair in host RAM; the streaming evaluator caps retention at
``keep_volumes`` and streams TIFFs + ROI traces, so peak RSS stays flat in
the frame count.

Usage: python scripts/eval_memory_demo.py [n_frames] | tee docs/results/eval_memory_r3.log

EVALMEM_CPU=1 runs on the local CPU backend — the artifact's claim is
host-RSS boundedness, which is platform-independent; useful when the
TPU tunnel is down (timings then reflect CPU, not device, speed).
"""
import os
import resource
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("EVALMEM_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    import dataclasses as dc

    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_synthetic_dataset, make_view_indices)
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    nd, vs, img, nl = 16, 64, 192, 9
    root = tempfile.mkdtemp(prefix="evalmem_")
    info = make_synthetic_dataset(root, n_fish=1, n_frames=n_frames,
                                  n_depths=nd, vol_side=vs, img_size=img,
                                  n_lenslets=nl, view_size=vs)
    ds = load_xlfm_data(info["fish_dirs"][0] + "/SLNet_preprocessed",
                        info["lenslet_file"], vol_shape=(vs, vs, nd),
                        img_shape=(img, img),
                        images_to_use=list(range(n_frames)),
                        n_depths_to_fill=nd, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    cfg = CWFAConfig(
        n_depths=nd, volume_side_size=vs, n_lenslets=nl,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=16,
        INN_cond_chans=8, batch_size=8, eval_every=10 ** 9,
        save_tiff_volumes=1, lenslet_file=info["lenslet_file"]).decode_lrs()
    out = tempfile.mkdtemp(prefix="evalmem_run_")
    tr = CWFATrainer(CWFAModel.build(cfg), cat.get_statistics(),
                     make_view_indices(ds.lenslet_coords, (img, img),
                                       (vs, vs)),
                     output_path=out)
    coords = [[(32, 32, 0)]]    # exercise the streaming CC accumulator too
    print(f"RSS before eval: {rss_gb():.2f} GB (dataset loaded: "
          f"{n_frames} frames)", flush=True)
    t0 = time.time()
    res = tr.evaluate(cat, "val", neural_coords=coords)
    wall = time.time() - t0
    n_tiffs = len(os.listdir(os.path.join(out, "stacks", "val", "pred")))
    vol_bytes = res["volumes_pred"][0].nbytes if res["volumes_pred"] else 0
    print(f"evaluated {len(res['psnr'])} frames in {wall:.1f}s "
          f"({wall/len(res['psnr'])*1e3:.0f} ms/frame incl. TIFF dumps)",
          flush=True)
    print(f"peak RSS after eval: {rss_gb():.2f} GB; volumes retained in "
          f"RAM: {len(res['volumes_pred'])} ({len(res['volumes_pred']) * vol_bytes / 1e6:.0f} MB) "
          f"of {len(res['psnr'])}; TIFFs streamed: {n_tiffs}; CC computed: "
          f"{res['CC']}", flush=True)
    unbounded = len(res["psnr"]) * 2 * vol_bytes / 1e9
    print(f"(accumulate-everything would have held "
          f"{unbounded:.1f} GB of volume pairs at this scale; flagship "
          f"512x512x96 frames are 100 MB each -> the reference's 250-frame "
          f"split would need ~50 GB)", flush=True)


if __name__ == "__main__":
    main()
