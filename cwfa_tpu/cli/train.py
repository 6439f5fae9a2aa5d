"""Training CLI — the reference ``python main.py`` equivalent.

Reference: main.py:21-403.  Builds leave-one-fish-out cross-validation groups
over the datasets found under --main_data_path (main.py:135-163), loads
train/finetune-val/test datasets, trains the CWFA coarse-to-fine, then
evaluates on val/test and runs OOD scoring.

Usage:
    python -m cwfa_tpu.cli.train --main_data_path <dir> [flags...]

All reference flags are accepted (integer-encoded learning rates included);
unknown-to-TPU flags (e.g. --main_gpu) are accepted for config parity and
ignored.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
from datetime import datetime

import numpy as np

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                           make_view_indices)
from cwfa_tpu.data import splits
from cwfa_tpu.data.dataset import read_lenslet_centers


def _count_frames(path: str) -> int:
    """Pages in the dataset's image stack (0 if unreadable)."""
    try:
        from cwfa_tpu.data.tiff import count_tiff_pages
        return count_tiff_pages(
            os.path.join(path, "XLFM_image", "XLFM_image_stack.tif"))
    except Exception:
        return 0


def _filter_by_volumes(path: str, use: list) -> list:
    """Drop frame indices whose per-frame volume TIFF is missing (a camera
    stack that outruns its deconvolved volumes crashed in XLFMDataset's
    lookup).  Existence is checked per INDEX — volumes may be numbered
    from a non-zero window (e.g. the test split's frames 500+), so a
    count comparison is meaningless."""
    vol_dir = os.path.join(path, "XLFM_stack")
    if not os.path.isdir(vol_dir):
        return use
    have = [i for i in use
            if glob.glob(os.path.join(vol_dir, f"*{i:03d}.tif"))]
    if not have:
        raise SystemExit(
            f"none of the requested frames {use[:5]}... have volumes "
            f"under {vol_dir} — deconvolve them first "
            "(python -m cwfa_tpu.cli.deconvolve)")
    if len(have) != len(use):
        print(f"warning: {len(use) - len(have)} requested frames have no "
              f"volume under {vol_dir} — skipped")
    return have
from cwfa_tpu.engine.ood import detect_ood
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel
from cwfa_tpu.utils.seeding import set_all_seeds


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(CWFAConfig):
        name = f"--{f.name}"
        default = f.default if f.default is not dataclasses.MISSING else None
        if f.default_factory is not dataclasses.MISSING:  # type: ignore
            default = f.default_factory()                 # type: ignore
        if isinstance(default, bool):
            p.add_argument(name, type=int, default=int(default))
        elif isinstance(default, (int, float, str)) or default is None:
            p.add_argument(name, type=type(default) if default is not None
                           else str, default=default)
        else:
            p.add_argument(name, nargs="*", type=float, default=list(default)
                           if isinstance(default, (tuple, list)) else default)
    p.add_argument("--img_size", type=int, default=2160,
                   help="camera frame side (reference psf_size_real)")
    p.add_argument("--max_samples", type=int, default=None)
    return p


def cross_validation_groups(main_data_path: str, use_sparse: bool):
    """Leave-one-fish-out CV sets (reference main.py:135-163)."""
    datasets = sorted(os.path.basename(d.rstrip("/"))
                      for d in glob.glob(os.path.join(main_data_path, "*"))
                      if os.path.isdir(d))
    sub = "SLNet_preprocessed" if use_sparse else "raw"
    paths = {d: os.path.join(main_data_path, d, sub) for d in datasets}
    groups = {}
    for nn in range(len(datasets)):
        train = [d for i, d in enumerate(datasets) if i != nn]
        groups[nn] = {"train": train, "val": train, "test": [datasets[nn]]}
    # single-fish groups at indices >= 30 (reference main.py:154-159)
    for fish_ix, fish in enumerate(datasets):
        if groups.get(fish_ix, {}).get("train"):
            other = groups[fish_ix]["train"][0]
            groups[30 + fish_ix] = {"train": [fish], "val": [fish],
                                    "test": [other]}
    return groups, paths


def main(argv=None):
    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    from cwfa_tpu.parallel import initialize_from_env, is_primary
    enable_compile_cache()
    # multi-host SPMD: CWFA_DISTRIBUTED/CWFA_COORDINATOR env (no-op
    # single-process); must precede the first backend touch
    distributed = initialize_from_env()
    args = build_parser().parse_args(argv)
    cfg_kwargs = {f.name: getattr(args, f.name)
                  for f in dataclasses.fields(CWFAConfig)
                  if hasattr(args, f.name)}
    cfg = CWFAConfig(**cfg_kwargs).decode_lrs()
    if cfg.INN_net_type == 0:
        # vestigial in the reference too: type 0 only picks a checkpoint
        # path (main.py:116); no construction path builds a plain INN
        print("warning: INN_net_type=0 (plain INN) is vestigial — "
              "training the CWF (type 1) architecture", flush=True)
    set_all_seeds(cfg.seed)

    groups, paths = cross_validation_groups(cfg.main_data_path,
                                            bool(cfg.use_sparse_for_all))
    # the fold index is a direct group KEY (reference main.py:181-187
    # indexes cross_validation_groups[nFold]): leave-one-out folds are
    # 0..n_fish-1, single-fish folds 30..30+n_fish-1.  No modulo remap —
    # fold 30 must select the single-fish group, not fold 30 % len(groups),
    # because splits.py's fold arithmetic (cv<30 dataset division, cv>=5
    # rescale) keys on the SAME number.
    cv = int(cfg.cross_validation_nFold)
    if cv not in groups and groups:
        raise SystemExit(
            f"--cross_validation_nFold {cv} is not a valid fold; available "
            f"folds: {sorted(groups)} (0..n-1 leave-one-fish-out, "
            f"30..30+n-1 single-fish)")
    group = groups.get(cv, {"train": list(paths), "val": list(paths),
                            "test": list(paths)})

    img_shape = (args.img_size, args.img_size)
    vol_shape = (cfg.volume_side_size, cfg.volume_side_size, cfg.n_depths)

    def load_group(names, images):
        dss = []
        for name in names:
            n_avail = _count_frames(paths[name])
            use = splits.clamp_indices(images, n_avail) if n_avail else images
            use = _filter_by_volumes(paths[name], use)
            dss.append(load_xlfm_data(
                paths[name], cfg.lenslet_file, vol_shape=vol_shape,
                img_shape=img_shape, images_to_use=use,
                n_depths_to_fill=cfg.n_depths, ds_id=name,
                volume_ths=tuple(cfg.volume_ths),
                volume_quantiles=tuple(cfg.quantile_ths),
                img_ths=tuple(cfg.images_ths),
                norm=cfg.volume_norm_func))
        return ConcatXLFMDataset(*dss)

    # --- frame-index resolution (reference main.py:195-233 semantics:
    # interleaved-stride train sampling, test/val windows from frame 500) ---
    # group-size rescale pair for folds >= 5 (main.py:195-196); passed as
    # the integer pair so splits.py replays the reference's floor division
    ratio = (len(groups.get(0, group)["train"]), len(group["train"]))
    if args.max_samples:
        train_idx = list(range(int(args.max_samples)))
        eval_idx = list(range(max(int(args.max_samples) // 2, 1)))
        test_idx = train_idx
    else:
        train_idx, window_start = splits.resolve_train(
            cfg.images_to_use, cv=cv, n_datasets=len(group["train"]),
            group_ratio=ratio)
        # eval/test windows start at the train resolution's n_samples
        # (main.py:215,219-231) so big train runs and eval stay disjoint;
        # only the TEST count rescales by group size (main.py:198-201),
        # the finetune-val count never does (main.py:224-227)
        eval_idx = splits.resolve_eval_indices(
            cfg.images_to_use_fine_tune_val, window_start=window_start)
        test_idx = splits.resolve_eval_indices(
            cfg.images_to_use_test,
            n_datasets_test=len(group["test"]),
            group0_train_len=len(groups.get(0, group)["train"]),
            window_start=window_start, rescale=True)
    train_ds = load_group(group["train"], train_idx)
    # finetune-val frames come from the TRAIN folders unless
    # --evaluation_dataset test (reference main.py:293-294)
    val_src = group["train"] if cfg.evaluation_dataset == "train" \
        else group["test"]
    val_ds = load_group(val_src, eval_idx)
    test_ds = load_group(group["test"], test_idx)

    stats = train_ds.get_statistics()
    coords = read_lenslet_centers(cfg.lenslet_file) + 50
    vidx = make_view_indices(coords, img_shape,
                             (cfg.volume_side_size, cfg.volume_side_size))
    cfg = dataclasses.replace(cfg, n_lenslets=len(coords))

    # run-dir naming with the evaluation prefix (reference main.py:165-168,
    # 356: default prefix CV{fold}_{temperature}T, 'test_set__' marker when
    # evaluating on the test folders)
    prefix = cfg.evaluation_prefix or f"CV{cv}_{cfg.INN_z_temperature}T"
    cfg = dataclasses.replace(cfg, evaluation_prefix=prefix)
    marker = "test_set__" if cfg.evaluation_dataset == "test" else ""
    out = os.path.join(
        cfg.output_testing_path,
        f"{datetime.now().strftime('%Y_%m_%d__%H_%M_%S')}_{marker}"
        f"{cfg.epochs}E_{prefix}_")
    if distributed and not is_primary():
        # every process runs the same SPMD programs; host-side artifacts
        # (checkpoints, TB, TIFF dumps) are process 0's job
        out = None

    if cfg.INN_net_type == 2:
        # XLFMNet baseline (main.py:99: "2: XLFMNet"; the reference's
        # switch never constructs it — here it trains for real)
        from cwfa_tpu.engine.xlfmnet_train import run_xlfmnet
        results = run_xlfmnet(cfg, train_ds, test_ds, stats, vidx,
                              output_path=out)
        for tag, res in results.items():
            if res["psnr"]:
                print(f"[{tag}] XLFMNet level-0 PSNR "
                      f"{np.mean([r[0] for r in res['psnr']]):.3f}")
        print(f"Saving directory: {out}")
        return results

    model = CWFAModel.build(cfg)
    # --mesh_data_axis/--mesh_space_axis: multi-chip training (batch over
    # 'data' with XLA-emitted gradient all-reduce, image rows over 'space';
    # no reference counterpart — the reference is single-GPU, SURVEY §2.6)
    mesh = None
    if int(cfg.mesh_data_axis) * int(cfg.mesh_space_axis) > 1:
        from cwfa_tpu.parallel import make_mesh
        mesh = make_mesh(n_data=int(cfg.mesh_data_axis),
                         n_space=int(cfg.mesh_space_axis))
        print(f"training on a {cfg.mesh_data_axis}x{cfg.mesh_space_axis} "
              "(data,space) device mesh", flush=True)
    trainer = CWFATrainer(model, stats, vidx, output_path=out, mesh=mesh)
    counts = model.param_counts(trainer.params)
    print(f"nParameters: WF: {counts['WF']}\tOmega: {counts['Omega']}\t"
          f"LRNN: {counts['LRNN']}\t\ttotal: {sum(counts.values())}")

    pretrain_path = cfg.pretrain_models_path
    if cfg.load_pretrained_networks and not pretrain_path:
        # --load_pretrained_networks: resolve a pretrained run directory by
        # convention.  The reference hard-codes per-CV-fold run paths under
        # pretrained_networks/ (main.py:115-131); here the newest run dir
        # under pretrained_networks/ whose name contains CV{cv} wins, falling
        # back to the newest run dir.
        runs_dir = "pretrained_networks"
        cands = sorted(d for d in glob.glob(os.path.join(runs_dir, "*"))
                       if os.path.isdir(d))
        tagged = [d for d in cands if f"CV{cv}" in os.path.basename(d)]
        pick = (tagged or cands)[-1:]
        if pick:
            pretrain_path = pick[0]
            print(f"load_pretrained_networks: using {pretrain_path}")
        else:
            print(f"load_pretrained_networks: no runs under {runs_dir}/")
    if pretrain_path:
        loaded = trainer.load_checkpoints(pretrain_path,
                                          steps=list(
                                              cfg.fine_tune_load_checkpoints)
                                          or None)
        print(f"Loaded checkpoint steps: {loaded}")

    # per-fish neuron coordinates for the CC metric (main.py:343-347)
    from cwfa_tpu.engine.metrics import read_neural_coordinates
    neural_coords = {}
    for tag, names in (("train", group["train"]), ("val", group["val"]),
                       ("test", group["test"])):
        cc = []
        for name in names:
            csv_path = os.path.join(paths[name],
                                    "Neural_activity_coordinates.csv")
            cc.append(read_neural_coordinates(csv_path)
                      if os.path.exists(csv_path) else [])
        neural_coords[tag] = cc

    results = trainer.fit(train_ds, val_ds, test_ds, verbose=True,
                          neural_coords=neural_coords)
    # final results block: per-layer table, final scalars, save_images
    # composites, stack MIP TIFFs (reference CWFA.py:1182-1288)
    trainer.finalize_results(results, output_posfix=prefix)
    for tag, res in results.items():
        if not res["times"]:          # empty split (evaluate's guard shape)
            print(f"[{tag}] no frames evaluated")
            continue
        psnr = np.mean([r[0] for r in res["psnr"]]) if res["psnr"] else 0
        print(f"[{tag}] level-0 PSNR {psnr:.3f}  mean time "
              f"{np.mean(res['times']):.4f}s  min {np.min(res['times']):.4f}s")

    ood = detect_ood(trainer, test_ds)
    print(f"OOD frames: {int(ood.is_ood.sum())}/{len(ood.is_ood)} "
          f"(threshold {ood.threshold} at step {ood.step_used})")
    print(f"Saving directory: {out}")
    return results


if __name__ == "__main__":
    main()
