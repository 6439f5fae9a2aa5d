"""Generate a FLAGSHIP-scale synthetic dataset tree on disk (512x512x96
volumes, 2160^2 camera frames, 29 lenslets) for the reference-default
100-epoch schedule run (round-4 VERDICT item 2).

Two fish x N frames: fish_0 trains, fish_1 is the held-out "novel fish"
for the OOD detect->finetune cycle.  Forward projection runs on the TPU
through the same PSF/OTF physics the deconvolution stack uses.

Usage: python scripts/gen_flagship_synth.py <out_root> [n_frames]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cwfa_flagship_synth"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from cwfa_tpu.data import make_synthetic_dataset

    t0 = time.time()
    info = make_synthetic_dataset(
        root, n_fish=2, n_frames=n_frames, n_depths=96, vol_side=512,
        img_size=2160, n_lenslets=29, view_size=512, seed=7,
        write_psf=False)
    print(f"flagship synthetic dataset: {root} "
          f"({time.time() - t0:.0f}s, fish={info['fish_dirs']})", flush=True)


if __name__ == "__main__":
    main()
