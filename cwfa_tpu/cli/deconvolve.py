"""Dataset deconvolution CLI — the reference ``main_deconvolve_dataset.py``.

Batch RL-deconvolves a dataset's XLFM camera frames into per-frame volume
TIFFs (the GT-volume generator for training).  Reference:
main_deconvolve_dataset.py:21-109.

Usage:
    python -m cwfa_tpu.cli.deconvolve --data_folder <fish_dir> \
        --psf_file <psf.tif> [--n_it 50 --n_depths 120 --vol_xy_size 600]
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

import numpy as np

from cwfa_tpu.data.dataset import XLFMDataset
from cwfa_tpu.data.psf import load_psf_otf
from cwfa_tpu.data.tiff import read_tiff_stack, write_tiff_stack
from cwfa_tpu.ops.deconv import xlfm_deconvolve
from cwfa_tpu.utils.projections import volume_2_projections


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_folder", required=True)
    p.add_argument("--psf_file", required=True)
    p.add_argument("--bkg_file", default="")
    p.add_argument("--lenslet_file", default="")
    p.add_argument("--images_to_use", nargs="+", type=int, default=[0, 1])
    p.add_argument("--n_it", type=int, default=50)
    p.add_argument("--posfix", type=str, default="")
    p.add_argument("--n_depths", type=int, default=241 // 2)
    p.add_argument("--vol_xy_size", type=int, default=600)
    p.add_argument("--n_split_fourier", type=int, default=1,
                   help="depth chunking for the FFTs (1 = all at once)")
    p.add_argument("--dark_current", type=int, default=0,
                   help="constant camera offset subtracted with the "
                        "background (the reference accepts this flag but "
                        "never consumes it — main_deconvolve_dataset.py:35; "
                        "honored here as the evident intent)")
    p.add_argument("--main_gpu", nargs="+", type=int, default=[0],
                   help="accepted for reference CLI compatibility; device "
                        "selection is N/A on TPU (jax.devices() is used)")
    p.add_argument("--img_size", type=int, default=2160)
    p.add_argument("--mesh_depth_axis", type=int, default=1,
                   help="shard the RL depth loop over N chips (each "
                        "depth's FFTs are independent; the image-estimate "
                        "sum is one psum over ICI) — requires n_depths %% N "
                        "== 0; 1 = single-device")
    return p


def main(argv=None):
    import jax.numpy as jnp
    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    from cwfa_tpu.parallel import initialize_from_env
    enable_compile_cache()
    initialize_from_env()  # multi-host meshes for --mesh_depth_axis
    args = build_parser().parse_args(argv)

    stack_path = os.path.join(
        args.data_folder,
        "XLFM_stack_" + datetime.now().strftime("%Y_%m_%d__%H_%M_%S")
        + args.posfix)
    os.makedirs(stack_path, exist_ok=True)

    lenslet = args.lenslet_file or os.path.join(
        os.path.dirname(args.data_folder.rstrip("/")),
        "lenslet_centers_python.txt")
    vol_shape = (args.vol_xy_size, args.vol_xy_size, args.n_depths)
    otf, psf_hw, full_hw = load_psf_otf(args.psf_file, vol_shape)

    background = float(args.dark_current)
    if args.bkg_file:
        from cwfa_tpu.data.dataset import _center_crop_img
        bkg = read_tiff_stack(args.bkg_file).mean(axis=0).astype(np.float32)
        background = _center_crop_img(
            bkg, (args.img_size, args.img_size)) + args.dark_current

    with open(os.path.join(stack_path, "arguments.txt"), "w") as f:
        f.write(str(vars(args)))

    depth_chunk = (None if args.n_split_fourier == 1
                   else max(args.n_depths // args.n_split_fourier, 1))
    from cwfa_tpu.ops.fft_conv import backend_has_fft
    if depth_chunk is None and not backend_has_fft():
        # the matmul-DFT fallback keeps ~2x more canvas temporaries live
        # than a native FFT; unchunked it exceeds HBM at the reference
        # CLI scale (measured 16.5 GB > 15.75 at 2880^2 x 120; 30-depth
        # scanned slabs fit and beat 60, 446.6 vs 455.6 ms/iter with the
        # windowed-input forward).  Explicit --n_split_fourier overrides.
        depth_chunk = 30
        print("FFT-fallback backend: depth-chunking the RL FFTs at "
              f"{depth_chunk} planes (override with --n_split_fourier)",
              flush=True)

    def frames():
        """Stream frames; the native prefetcher decodes frame n+1 on a
        background thread while the TPU deconvolves frame n.  The dataset
        fallback is constructed LAZILY — eagerly decoding the whole stack
        up front would double the host-I/O the prefetcher exists to hide.

        Fallback fires only when the native STREAM CANNOT START (runtime
        unavailable, unreadable file); a mid-stream decode failure
        propagates — swallowing it would re-deconvolve already-emitted
        frames through the fallback and bury the informative error."""
        it = None
        try:
            from cwfa_tpu.data.native_tiff import PrefetchingTiffReader
            path = os.path.join(args.data_folder, "XLFM_image",
                                "XLFM_image_stack.tif")
            it = PrefetchingTiffReader(path, pages=list(args.images_to_use))
        except Exception:
            it = None
        if it is not None:
            with it:
                for page_ix, frame in it:
                    from cwfa_tpu.data.dataset import (_pad_to_square_img,
                                                       _center_crop_img)
                    # same hygiene as XLFMDataset.__init__ (reference
                    # XLFMDataset.py:101-104): NaN/Inf would NaN the first
                    # RL ratio and freeze the volume at the ones init
                    im = np.clip(np.nan_to_num(frame.astype(np.float32)),
                                 0, 50000)
                    im = _center_crop_img(_pad_to_square_img(im),
                                          (args.img_size, args.img_size))
                    yield page_ix, im
            return
        ds = XLFMDataset(args.data_folder, lenslet,
                         img_shape=(args.img_size, args.img_size),
                         images_to_use=args.images_to_use, load_vols=False)
        # ds.images_to_use is the FILTERED page list — pairing positions
        # against the unfiltered request would mislabel frames when any
        # requested page was out of range
        for pos, img_ix in enumerate(ds.images_to_use):
            yield img_ix, ds.stacked_views[pos]

    mesh = None
    if int(args.mesh_depth_axis) > 1:
        from cwfa_tpu.parallel import make_mesh
        if args.n_depths % int(args.mesh_depth_axis):
            raise SystemExit(
                f"--mesh_depth_axis {args.mesh_depth_axis} must divide "
                f"--n_depths {args.n_depths}")
        mesh = make_mesh(n_data=1, n_space=int(args.mesh_depth_axis))
        print(f"deconvolving depth-sharded over {args.mesh_depth_axis} "
              "chips", flush=True)
        if depth_chunk is not None:
            print("warning: --n_split_fourier is ignored on the sharded "
                  "path (each shard FFTs its n_depths/N slice at once; "
                  "the mesh factor itself divides the working set)",
                  flush=True)

    last_vol = None
    for img_ix, frame in frames():
        views = frame[None, None] - background
        if mesh is not None:
            from cwfa_tpu.ops.deconv import xlfm_deconvolve_sharded
            vol, _ = xlfm_deconvolve_sharded(
                mesh, otf, jnp.asarray(views), n_iter=args.n_it,
                obj_hw=(args.vol_xy_size, args.vol_xy_size),
                roi_depths=min(90, args.n_depths), full_hw=full_hw)
        else:
            vol, _ = xlfm_deconvolve(
                otf, jnp.asarray(views), n_iter=args.n_it,
                obj_hw=(args.vol_xy_size, args.vol_xy_size),
                roi_depths=min(90, args.n_depths), depth_chunk=depth_chunk,
                full_hw=full_hw)
        last_vol = np.asarray(vol)[0]
        write_tiff_stack(
            os.path.join(stack_path, f"XLFM_stack_{img_ix:03d}.tif"), last_vol)
        print(f"deconvolved frame {img_ix} -> "
              f"{stack_path}/XLFM_stack_{img_ix:03d}.tif")

    if last_vol is not None:
        mip = volume_2_projections(last_vol[None])[0]
        write_tiff_stack(os.path.join(stack_path, "preview_MIP.tif"), mip)
    print(f"Output path: {stack_path}")
    return stack_path


if __name__ == "__main__":
    main()
