"""Streaming reconstruction service CLI.

Reconstructs every XLFM camera frame in a directory (optionally watching
for new files) into volume TIFFs through the batched int8 inference
pipeline — the deployment-shaped version of the reference's per-frame eval
dump (CWFA.py:1047-1055).

  python -m cwfa_tpu.cli.serve --pretrain_models_path runs/xyz \\
      --in_dir frames/ --out_dir volumes/ [--batch 8] [--watch 2.0]

Statistics and the mean-volume conditioning caches come from the
checkpoint directory (persisted by the trainer, round-2); lenslet centers
from --lenslet_file.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.cli.train import build_parser as _train_parser


def build_parser():
    p = argparse.ArgumentParser(
        description=__doc__, parents=[_train_parser()], add_help=False,
        conflict_handler="resolve")
    p.add_argument("-h", "--help", action="help")
    p.add_argument("--in_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--watch", type=float, default=0.0,
                   help="poll the input dir every N seconds (0 = one pass)")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--no_int8", action="store_true",
                   help="disable the int8 UNet inference path")
    return p


def main(argv=None):
    import jax.numpy as jnp

    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    from cwfa_tpu.parallel import initialize_from_env
    enable_compile_cache()
    initialize_from_env()  # multi-host meshes for --mesh_data/space_axis
    from cwfa_tpu.data.dataset import read_lenslet_centers
    from cwfa_tpu.data.views import make_view_indices
    from cwfa_tpu.data.tiff import read_tiff_stack
    from cwfa_tpu.engine.inference import XLFMReconstructor
    from cwfa_tpu.engine.serving import serve_directory
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel
    import os

    args = build_parser().parse_args(argv)
    cfg_kwargs = {f.name: getattr(args, f.name)
                  for f in dataclasses.fields(CWFAConfig)
                  if hasattr(args, f.name)}
    cfg = CWFAConfig(**cfg_kwargs).decode_lrs()
    if not cfg.pretrain_models_path:
        sys.exit("--pretrain_models_path (checkpoint dir) is required")

    coords = read_lenslet_centers(cfg.lenslet_file) + 50
    cfg = dataclasses.replace(cfg, n_lenslets=len(coords))
    img_shape = (args.img_size, args.img_size)
    vidx = make_view_indices(coords, img_shape,
                             (cfg.volume_side_size, cfg.volume_side_size))

    model = CWFAModel.build(cfg)
    trainer = CWFATrainer(model, None, vidx)
    trainer.load_checkpoints(cfg.pretrain_models_path)
    if trainer.stats is None:
        sys.exit("checkpoint has no dataset statistics")
    if not trainer.mean_caches:
        sys.exit("checkpoint has no mean-volume caches "
                 "(retrain or pass a dir saved by round-2+)")
    mean_caches = next(iter(trainer.mean_caches.values()))

    compute_dtype = jnp.bfloat16 if cfg.use_half_precision else jnp.float32
    calib = None
    if not args.no_int8:
        names = sorted(f for f in os.listdir(args.in_dir)
                       if f.endswith(".tif"))[:2]
        if names:
            frames = [read_tiff_stack(os.path.join(args.in_dir, n))
                      for n in names]
            calib = np.stack([f[0] if f.ndim == 3 else f
                              for f in frames]).astype(np.float32)
        else:
            print("warning: no frames in --in_dir to calibrate int8 on; "
                  "serving with the (slower) f32 UNet path. Pre-place a "
                  "couple of frames or pass --no_int8 to silence this.",
                  flush=True)
    # --mesh_data_axis/--mesh_space_axis: multi-chip serving (batch over
    # 'data', image rows over 'space'); 1x1 (default) stays single-device
    mesh = None
    if int(cfg.mesh_data_axis) * int(cfg.mesh_space_axis) > 1:
        from cwfa_tpu.parallel import make_mesh
        mesh = make_mesh(n_data=int(cfg.mesh_data_axis),
                         n_space=int(cfg.mesh_space_axis))
        print(f"serving on a {cfg.mesh_data_axis}x{cfg.mesh_space_axis} "
              "(data,space) device mesh", flush=True)
    recon = XLFMReconstructor(
        model, trainer.params, trainer.mstate, trainer.stats, vidx,
        mean_caches, mesh=mesh, deterministic=True,
        compute_dtype=compute_dtype,
        use_int8=calib is not None, calib_frames=calib)
    recon.warmup(args.batch, img_shape)

    out = serve_directory(recon, args.batch, img_shape, args.in_dir,
                          args.out_dir, poll_seconds=args.watch,
                          limit=args.limit or None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
