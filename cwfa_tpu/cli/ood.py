"""OOD evaluation CLI — the working equivalent of the reference's missing
``main_OOD.evaluate_OOD_prediction`` (imported and invoked only in
commented-out code, reference main.py:16,398-402; behavior specified by
SURVEY.md §5.9).

Scores every frame's forward NLL against the trained model, writes a report,
optionally renders NLL distribution plots (--create_dist_plots) and runs the
fast finetune loop on the flagged frames.

Usage:
    python -m cwfa_tpu.cli.ood --main_data_path <dir> \
        --pretrain_models_path <ckpt_dir> [--finetune 1]
"""

from __future__ import annotations

import dataclasses
import json
import os

from cwfa_tpu.cli.train import build_parser, cross_validation_groups
from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import ConcatXLFMDataset, load_xlfm_data, make_view_indices
from cwfa_tpu.data.dataset import read_lenslet_centers
from cwfa_tpu.engine.ood import detect_ood, finetune_on_novel
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel


def main(argv=None):
    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    from cwfa_tpu.parallel import initialize_from_env
    enable_compile_cache()
    initialize_from_env()
    p = build_parser()
    p.add_argument("--finetune", type=int, default=0,
                   help="run the fast finetune loop on flagged frames")
    p.add_argument("--report", type=str, default="ood_report.json")
    args = p.parse_args(argv)
    cfg_kwargs = {f.name: getattr(args, f.name)
                  for f in dataclasses.fields(CWFAConfig)
                  if hasattr(args, f.name)}
    cfg = CWFAConfig(**cfg_kwargs).decode_lrs()

    groups, paths = cross_validation_groups(cfg.main_data_path,
                                            bool(cfg.use_sparse_for_all))
    # the fold index is a direct group KEY (leave-one-out 0..n-1,
    # single-fish 30..30+n-1) — no modulo remap (see cli/train.py)
    cv = int(cfg.cross_validation_nFold)
    if cv not in groups and groups:
        raise SystemExit(
            f"--cross_validation_nFold {cv} is not a valid fold; "
            f"available folds: {sorted(groups)}")
    test_names = groups.get(cv, {"test": list(paths)})["test"]

    img_shape = (args.img_size, args.img_size)
    vol_shape = (cfg.volume_side_size, cfg.volume_side_size, cfg.n_depths)
    n_imgs = args.max_samples or 4
    dss = [load_xlfm_data(paths[n], cfg.lenslet_file, vol_shape=vol_shape,
                          img_shape=img_shape,
                          images_to_use=list(range(int(n_imgs))),
                          n_depths_to_fill=cfg.n_depths, ds_id=n)
           for n in test_names]
    ds = ConcatXLFMDataset(*dss)
    stats = ds.get_statistics()
    coords = read_lenslet_centers(cfg.lenslet_file) + 50
    cfg = dataclasses.replace(cfg, n_lenslets=len(coords))
    vidx = make_view_indices(coords, img_shape,
                             (cfg.volume_side_size, cfg.volume_side_size))

    model = CWFAModel.build(cfg)
    trainer = CWFATrainer(model, stats, vidx)
    if cfg.pretrain_models_path:
        trainer.load_checkpoints(cfg.pretrain_models_path)

    # tag='train': the detect pass primes the trainer's device-side GT
    # pyramids + NLL caches under the tag the finetune epochs read, so the
    # whole detect->finetune->re-score cycle uploads each volume ONCE
    result = detect_ood(trainer, ds, tag="train")
    print(f"OOD: {int(result.is_ood.sum())}/{len(result.is_ood)} frames "
          f"flagged (NLL > {result.threshold} at step {result.step_used})")
    report = {
        "threshold": result.threshold,
        "step": result.step_used,
        "scores": result.scores.tolist(),
        "is_ood": result.is_ood.astype(int).tolist(),
    }

    if cfg.create_dist_plots:
        from cwfa_tpu.utils.plots import plot_distributions, figure_to_array
        fig = plot_distributions(result.scores,
                                 result.scores[~result.is_ood]
                                 if (~result.is_ood).any() else result.scores)
        out_png = os.path.splitext(args.report)[0] + "_dist.png"
        from PIL import Image
        Image.fromarray(figure_to_array(fig)).save(out_png)
        print(f"distribution plot: {out_png}")

    if args.finetune and result.is_ood.any():
        losses = finetune_on_novel(
            trainer, ds, optimize_steps=tuple(
                int(s) for s in cfg.fine_tune_optimize_steps),
            verbose=True, reuse_caches=True)
        report["finetune_losses"] = {str(k): v for k, v in losses.items()}
        post = detect_ood(trainer, ds, tag="train")
        report["scores_after_finetune"] = post.scores.tolist()
        print(f"after finetune: {int(post.is_ood.sum())} frames still OOD")

    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report: {args.report}")
    return report


if __name__ == "__main__":
    main()
