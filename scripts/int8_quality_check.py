"""PSNR impact of the int8 inference paths on a TRAINED model.

Trains the synthetic config briefly, then reconstructs the training frames
through (a) the f32/bf16 pipeline, (b) int8 UNet, (c) int8 UNet + int8
towers, and reports PSNR of each against the GT volumes plus the
pipeline-vs-pipeline deltas — the PSNR-validated tolerance VERDICT round-2
item #2 asks for, on real (trained) weights rather than random init.
"""
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b, peak=None):
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    peak = peak or float(np.abs(b).max())
    return 10.0 * np.log10(peak ** 2 / mse)


def main():
    import jax
    import jax.numpy as jnp

    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_synthetic_dataset, make_view_indices)
    from cwfa_tpu.engine.inference import XLFMReconstructor
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    nd, vs, img, nl = 16, 64, 192, 9
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    root = tempfile.mkdtemp(prefix="int8q_")
    info = make_synthetic_dataset(root, n_fish=1, n_frames=6, n_depths=nd,
                                  vol_side=vs, img_size=img, n_lenslets=nl,
                                  view_size=vs)
    ds = load_xlfm_data(info["fish_dirs"][0] + "/SLNet_preprocessed",
                        info["lenslet_file"], vol_shape=(vs, vs, nd),
                        img_shape=(img, img), images_to_use=list(range(6)),
                        n_depths_to_fill=nd, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    cfg = CWFAConfig(
        n_depths=nd, volume_side_size=vs, n_lenslets=nl,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=16,
        INN_cond_chans=8, epochs=epochs, eval_every=10 ** 9,
        save_tiff_volumes=0, lenslet_file=info["lenslet_file"]).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(ds.lenslet_coords, (img, img), (vs, vs))
    trainer = CWFATrainer(model, cat.get_statistics(), vidx)
    for ep in range(epochs):
        loss = trainer.train_epoch(cat, ep)
    print(f"trained {epochs} epochs, final loss {loss:.4f}", flush=True)

    frames = np.stack([np.asarray(cat[i][0]) for i in range(6)])
    gts = np.stack([np.asarray(cat[i][1]) for i in range(6)])
    mean_caches = trainer.mean_caches[0]
    stats = trainer.stats

    def run(**kw):
        r = XLFMReconstructor(model, trainer.params, trainer.mstate, stats,
                              vidx, mean_caches, deterministic=True,
                              calib_frames=frames[:2], **kw)
        return np.asarray(r(frames), np.float64)

    v_f32 = run()
    v_u8 = run(use_int8=True)
    v_all8 = run(use_int8=True, use_int8_towers=True)

    peak = float(np.abs(gts).max())
    out = {
        "psnr_vs_gt_f32": round(psnr(v_f32, gts, peak), 3),
        "psnr_vs_gt_int8_unet": round(psnr(v_u8, gts, peak), 3),
        "psnr_vs_gt_int8_all": round(psnr(v_all8, gts, peak), 3),
        "psnr_int8_unet_vs_f32_pipeline": round(psnr(v_u8, v_f32), 3),
        "psnr_int8_all_vs_f32_pipeline": round(psnr(v_all8, v_f32), 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
