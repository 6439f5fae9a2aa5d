"""Round-3 flag-surface tests: split-index resolution (main.py:195-233),
volume_norm_func (utils.py:128-184), max_test_load_epoch checkpoint cap,
fine_tune_use_model_args lr override (CWFA.py:599-600), files_to_store,
and the evaluation TB image/figure summaries (CWFA.py:1070-1072,1144-1169)."""

import dataclasses
import os
import zipfile

import numpy as np
import pytest

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import splits
from cwfa_tpu.data.dataset import apply_volume_norm


# ---------------------------------------------------------------- splits

def test_train_indices_interleaved_stride():
    # reference main.py:214-216: range(0, 500, 500//n)[:n] after //n_datasets
    idx = splits.resolve_train_indices(50, cv=1, n_datasets=1)
    assert idx == list(range(0, 500, 10))[:50]
    # count divided across datasets for multi-fish folds (cv < 30)
    idx2 = splits.resolve_train_indices(50, cv=1, n_datasets=5)
    assert idx2 == list(range(0, 500, 50))[:10]
    # single-fish folds (cv >= 30) keep the full count
    idx3 = splits.resolve_train_indices(50, cv=31, n_datasets=5)
    assert len(idx3) == 50


def test_train_indices_fold_rescale_floor_division():
    # main.py:195-196: for folds >= 5, n = n*len(groups[0].train) //
    # len(groups[cv].train) BEFORE the //n_datasets split.  The integer
    # pair form replays the reference's floor arithmetic exactly where a
    # float ratio would round low (3 * (1/3) -> int(0.999...) = 0).
    idx = splits.resolve_train_indices(3, cv=5, n_datasets=1,
                                       group_ratio=(1, 3))
    assert len(idx) == 1  # 3*1//3 = 1
    idx = splits.resolve_train_indices(50, cv=5, n_datasets=1,
                                       group_ratio=(7, 3))
    assert len(idx) == 116  # 50*7//3
    # folds < 5 ignore the rescale
    idx = splits.resolve_train_indices(50, cv=1, n_datasets=1,
                                       group_ratio=(7, 3))
    assert len(idx) == 50


def test_train_indices_list_passthrough():
    assert splits.resolve_train_indices([3, 7, 9]) == [3, 7, 9]
    # a 1-element list collapses to its int (main.py:209-210)
    assert splits.resolve_train_indices([10], n_datasets=1) == \
        splits.resolve_train_indices(10, n_datasets=1)


def test_eval_indices_window_from_500():
    # reference main.py:219-231: test/val = contiguous window from frame 500
    assert splits.resolve_eval_indices(5) == [500, 501, 502, 503, 504]
    assert splits.resolve_eval_indices([7, 8]) == [7, 8]
    assert splits.resolve_eval_indices([5]) == list(range(500, 505))


def test_eval_window_follows_train_n_samples():
    # main.py:215: n_samples = max(500, train count); the test/val windows
    # start THERE (main.py:219-231), so a 1200-frame train request with 2
    # fish (600 each) pushes eval to frame 600+ — no train/eval overlap.
    train_idx, window = splits.resolve_train(1200, cv=1, n_datasets=2)
    assert window == 600
    assert train_idx == list(range(0, 600))
    ev = splits.resolve_eval_indices(5, window_start=window)
    assert ev == [600, 601, 602, 603, 604]
    assert not set(train_idx) & set(ev)
    # explicit index lists leave the window at 500 (n_samples untouched)
    _, window = splits.resolve_train([1, 2, 3])
    assert window == 500


def test_eval_test_list_rescale_any_fold_val_never():
    # main.py:198-201 sits directly under the cv-is-not-None guard: the
    # single-element TEST list rescale applies at EVERY fold...
    got = splits.resolve_eval_indices([250], n_datasets_test=1,
                                      group0_train_len=4, rescale=True)
    assert got == list(range(500, 500 + 1000))  # 250*4//1
    # ...but a bare int never rescales (the reference only rescales the
    # list form), and fine-tune-val (rescale=False) never rescales
    assert len(splits.resolve_eval_indices(250, n_datasets_test=1,
                                           group0_train_len=4,
                                           rescale=True)) == 250
    assert len(splits.resolve_eval_indices([250], n_datasets_test=1,
                                           group0_train_len=4)) == 250


def test_clamp_indices_small_dataset():
    assert splits.clamp_indices([500, 501, 502], 10) == [0, 1, 2]
    assert splits.clamp_indices([2, 8, 40], 10) == [2, 8]


# --------------------------------------------------------- volume norm

def test_volume_norm_modes():
    v = np.array([[0.5, 2.0], [4.0, 8.0]], np.float32)
    out = apply_volume_norm(v.copy(), "std", (0.0, 100.0))
    np.testing.assert_allclose(out.mean(), 0.0, atol=1e-6)
    np.testing.assert_allclose(out.std(ddof=1), 1.0, atol=1e-6)

    out = apply_volume_norm(v.copy(), "max", (0.1, 100.0))
    assert out.max() == 1.0
    assert out[0, 0] == 0.0          # 0.5/8 = 0.0625 < 0.1 -> zeroed

    out = apply_volume_norm(v.copy(), None, (1.0, 5.0))
    assert out[0, 0] == 0.0 and out[1, 1] == 5.0

    with pytest.raises(ValueError):
        apply_volume_norm(v.copy(), "bogus", (0, 1))


# ------------------------------------------- checkpoint flag semantics

def test_max_test_load_epoch_caps_discovery(tmp_path):
    from cwfa_tpu.engine.checkpoints import (discover_checkpoints,
                                             save_step_checkpoint)
    cfg = CWFAConfig()
    for ep in (3, 7, 11):
        save_step_checkpoint(str(tmp_path), 1, ep, cfg)
    assert discover_checkpoints(str(tmp_path))[1][0] == 11
    assert discover_checkpoints(str(tmp_path), max_epoch=8)[1][0] == 7


def _tiny_rig(tmp_path_factory):
    from cwfa_tpu.data import make_synthetic_dataset, load_xlfm_data, \
        ConcatXLFMDataset, make_view_indices
    root = str(tmp_path_factory.mktemp("r3flags"))
    info = make_synthetic_dataset(root, n_fish=1, n_frames=2, n_depths=8,
                                  vol_side=16, img_size=64, n_lenslets=4,
                                  view_size=16)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    ds = load_xlfm_data(fish, info["lenslet_file"],
                        vol_shape=(16, 16, 8), img_shape=(64, 64),
                        images_to_use=[0, 1], n_depths_to_fill=8,
                        ds_id="f0")
    cat = ConcatXLFMDataset(ds)
    cfg = CWFAConfig(n_depths=8, volume_side_size=16, n_lenslets=4,
                     INN_max_down_steps=2, INN_n_blocks=2,
                     INN_internal_chans=4, INN_cond_chans=2, epochs=2,
                     eval_every=2, save_tiff_volumes=0).decode_lrs()
    vidx = make_view_indices(ds.lenslet_coords, (64, 64), (16, 16))
    return cat, cfg, vidx


def test_fine_tune_use_model_args_lr_override(tmp_path_factory, tmp_path):
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    cat, cfg, vidx = _tiny_rig(tmp_path_factory)
    stats = cat.get_statistics()
    out = str(tmp_path / "ck")

    # write checkpoints whose stored config carries a DIFFERENT flow lr
    ck_cfg = dataclasses.replace(cfg, learning_rate=5e-4)
    tr = CWFATrainer(CWFAModel.build(ck_cfg), stats, vidx, output_path=out)
    tr.save_checkpoints(epoch=1)

    cfg2 = dataclasses.replace(cfg, fine_tune_use_model_args=1)
    tr2 = CWFATrainer(CWFAModel.build(cfg2), stats, vidx)
    base_tx = tr2.tx_flow
    loaded = tr2.load_checkpoints(out)
    assert loaded
    # the per-step flow optimizer was re-created from the checkpoint lr
    # (reference CWFA.py:599-600 reads args_nets[step].learning_rate).
    # Lion's update is -lr*sign(c) (+ wd*params, killed by zero params),
    # so a fixed gradient exposes the effective lr as |update| exactly.
    assert tr2.tx_flow_steps[0] is not base_tx
    import jax as _jax
    import numpy as _np
    zero_p = _jax.tree_util.tree_map(lambda x: np.zeros_like(x),
                                     tr2.params["flow"][0])
    grads = _jax.tree_util.tree_map(lambda x: np.ones_like(x), zero_p)
    st = tr2.tx_flow_steps[0].init(zero_p)
    ups, _ = tr2.tx_flow_steps[0].update(grads, st, zero_p)
    mags = _np.unique(_np.round(_np.abs(_np.concatenate(
        [_np.asarray(u).ravel() for u in _jax.tree_util.tree_leaves(ups)])),
        10))
    assert 5e-4 in mags and len(mags) <= 2, mags   # {0?, ck lr} only

    # without the flag, optimizers stay untouched
    tr3 = CWFATrainer(CWFAModel.build(cfg), stats, vidx)
    tr3.load_checkpoints(out)
    assert all(t is tr3.tx_flow for t in tr3.tx_flow_steps)


def test_files_to_store_pattern(tmp_path):
    from cwfa_tpu.engine.trainer import snapshot_sources
    out = str(tmp_path)
    snapshot_sources(out, pattern="config*.py")
    names = zipfile.ZipFile(os.path.join(out, "files.zip")).namelist()
    assert any(n.endswith("config.py") for n in names)
    assert not any(n.endswith("trainer.py") for n in names)


# -------------------------------------- TB image summaries in evaluation

def test_eval_writes_tb_images(tmp_path_factory, tmp_path):
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel
    from cwfa_tpu.utils.tb_writer import read_event_file

    cat, cfg, vidx = _tiny_rig(tmp_path_factory)
    cfg = dataclasses.replace(cfg, save_images=1, create_dist_plots=1,
                              batch_size=2)
    out = str(tmp_path / "run")
    tr = CWFATrainer(CWFAModel.build(cfg), cat.get_statistics(), vidx,
                     output_path=out)
    res = tr.evaluate(cat, "val", epoch=0)
    assert len(res["nll"]) == 2 and res["nll"][0].shape == (1,)
    tr.log.tb_writer.flush()

    ev_files = [f for f in os.listdir(out) if f.startswith("events.out")]
    assert ev_files
    events = read_event_file(os.path.join(out, ev_files[0]))
    tags = {e["tag"] for e in events if e["kind"] == "image"}
    # the pred projection grid is unconditional; gt + per-step MIPs and the
    # condition map ride save_images; histograms ride create_dist_plots
    assert "projections_pred/val" in tags
    assert "projections_gt/val" in tags
    assert any(t.startswith("fine_tune/recon_val_step") for t in tags)
    assert any(t.startswith("fine_tune/GT_val_step") for t in tags)
    assert "condition/val_step0" in tags
    assert any(t.startswith("posterior/val/step") for t in tags)
    # scalars still flow
    stags = {e["tag"] for e in events if e["kind"] == "scalar"}
    assert any(t.startswith("fine_tune/psnr/val") for t in stags)


# ------------------------------------------------- streaming CC metric

def test_roi_accumulator_matches_batch_path():
    from cwfa_tpu.engine.metrics import RoiTraceAccumulator, corr_coeff_3d
    rng = np.random.RandomState(0)
    T, D, H, W = 6, 8, 24, 24
    gt = rng.rand(T, D, H, W).astype(np.float64)
    pr = gt + 0.01 * rng.randn(T, D, H, W)
    coords = [(12, 12, 0), (5, 18, 1)]
    cc_batch, rec_batch = corr_coeff_3d(gt, pr, coords, filter_width=3)

    acc = RoiTraceAccumulator(coords)
    for t in range(T):
        acc.add(gt[t], pr[t])
    cc_stream, rec_stream = acc.finalize(filter_width=3)
    np.testing.assert_allclose(cc_stream, cc_batch, rtol=1e-9)
    assert len(rec_stream) == len(rec_batch)


def test_roi_reservoir_uniform_after_overflow():
    """Algorithm-R reservoir: once past the cap, the sample must stay
    uniform over the WHOLE stream — no first-frame bias, no per-frame
    replacement cap.  Stream 10 frames with disjoint value ranges and a
    tiny cap; each frame should hold ~1/10 of the slots and the reservoir
    median should track the true stream median."""
    from cwfa_tpu.engine.metrics import RoiTraceAccumulator

    cap = 2000
    acc = RoiTraceAccumulator([(2, 2, 0)], reservoir_cap=cap, seed=3)
    n_per = 5000
    for f in range(10):
        # frame f's voxels all lie in [f+1, f+2) -> provenance readable
        vals = np.random.RandomState(f).rand(4, 50, 25) + (f + 1)
        acc.add(vals, vals)
    assert acc._res.size == cap
    assert acc._n_seen == 10 * n_per
    frac_per_frame = np.array([
        ((acc._res >= f + 1) & (acc._res < f + 2)).mean()
        for f in range(10)])
    # uniform -> each frame ~0.1; the old code kept frame 0 at ~0.4 and
    # starved the tail
    assert frac_per_frame.max() < 0.2
    assert frac_per_frame.min() > 0.03
    true_median = np.median(np.concatenate(
        [np.random.RandomState(f).rand(n_per) + (f + 1) for f in range(10)]))
    assert abs(float(np.median(acc._res)) - true_median) < 0.25


def test_finalize_results_artifacts(tmp_path_factory, tmp_path):
    """The final results block (CWFA.py:1182-1288): per-layer summary
    scalars, corr/time scalars, the save_images 'Output' composites + PNGs,
    and the all-frame stack_MIP TIFFs."""
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel
    from cwfa_tpu.utils.tb_writer import read_event_file
    from cwfa_tpu.data.tiff import read_tiff_stack

    cat, cfg, vidx = _tiny_rig(tmp_path_factory)
    # fine_tune=0: the reference writes the stack MIPs only on non-finetune
    # runs (finetune runs re-serialize checkpoints instead, CWFA.py:1280-1286)
    cfg = dataclasses.replace(cfg, save_images=1, save_tiff_volumes=1,
                              fine_tune=0)
    out = str(tmp_path / "run")
    tr = CWFATrainer(CWFAModel.build(cfg), cat.get_statistics(), vidx,
                     output_path=out)
    results = {"train": tr.evaluate(cat, "train", epoch=0)}
    assert len(results["train"]["projections_pred_steps"]) == 2
    assert len(results["train"]["projections_pred_steps"][0]) == \
        tr.model.n_flow_steps + 1
    tr.finalize_results(results, output_posfix="t")
    tr.log.tb_writer.flush()

    ev_files = [f for f in os.listdir(out) if f.startswith("events.out")]
    events = read_event_file(os.path.join(out, ev_files[0]))
    stags = {e["tag"] for e in events if e["kind"] == "scalar"}
    assert {"psnr/step_0", "MAPE/step_0", "corr_coeff_mean/train",
            "time/mean", "time/min"} <= stags
    itags = [e for e in events if e["kind"] == "image"
             and e["tag"] == "Output"]
    assert len(itags) == 2          # one composite per frame
    for i in range(2):
        for f in (f"_output_image_pred{i}.png", f"_output_image_gt{i}.png",
                  f"_output_t_image_{i}.png"):
            assert os.path.exists(os.path.join(out, f)), f
    # all-frame MIP stacks
    gt_mips = read_tiff_stack(os.path.join(out, "stack_MIP_gt.tif"))
    pr_mips = read_tiff_stack(os.path.join(out, "stack_MIP_prediction.tif"))
    assert gt_mips.shape[0] == 2 and pr_mips.shape == gt_mips.shape
    assert np.isfinite(pr_mips).all()


def test_save_model_zero_skips_checkpoints(tmp_path_factory, tmp_path):
    """--save_model 0: metrics-only run, no checkpoint files.  The
    reference declares the flag (main.py:51) but never reads it; honored
    as evident intent in CWFATrainer.fit."""
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    cat, cfg, vidx = _tiny_rig(tmp_path_factory)
    for save_model, expect in ((0, 0), (1, 1)):
        cfg_i = dataclasses.replace(cfg, save_model=save_model, epochs=2,
                                    eval_every=2)
        out = str(tmp_path / f"run{save_model}")
        tr = CWFATrainer(CWFAModel.build(cfg_i), cat.get_statistics(),
                         vidx, output_path=out)
        tr.fit(cat, None, None)
        ckpts = [f for f in os.listdir(out) if f.startswith("model_step_")]
        assert bool(ckpts) == bool(expect), (save_model, ckpts)


def test_train_remat_cond_env_flag(monkeypatch, tmp_path):
    """CWFA_TRAIN_REMAT_COND wraps the flow-step cond net in jax.checkpoint
    — numerics must be identical to the baseline step (remat changes the
    backward schedule, not the math)."""
    import numpy as np
    import jax

    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data.stats import DatasetStatistics
    from cwfa_tpu.data.views import make_view_indices
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    cfg = CWFAConfig(n_depths=8, volume_side_size=16, n_lenslets=4,
                     INN_max_down_steps=2, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4,
                     use_half_precision=0).decode_lrs()
    model = CWFAModel.build(cfg)
    stats = DatasetStatistics(10.0, 5.0, 10.0, 5.0, 1.0, 0.5)
    coords = np.array([[8, 8], [8, 40], [40, 8], [40, 40]])
    vidx = make_view_indices(coords, (64, 64), (16, 16))
    rng = np.random.RandomState(0)
    views = rng.randn(1, 4, 16, 16).astype(np.float32)
    mean_c = rng.randn(1, 4, 16, 16).astype(np.float32)
    gt = rng.randn(1, 8, 16, 16).astype(np.float32)
    ups = rng.randn(1, 4, 16, 16).astype(np.float32)
    key = jax.random.PRNGKey(3)

    def run_step():
        tr = CWFATrainer(model, stats, vidx, seed=0)
        out = tr._flow_steps[0](tr.params["flow"][0], tr.params["cond"][0],
                                tr.opt_flow[0], tr.opt_cond[0], views,
                                mean_c, gt, ups, key)
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(out)]

    monkeypatch.delenv("CWFA_TRAIN_REMAT_COND", raising=False)
    base = run_step()
    monkeypatch.setenv("CWFA_TRAIN_REMAT_COND", "1")
    remat = run_step()
    for a, b in zip(base, remat):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
