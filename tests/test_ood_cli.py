"""OOD detection + finetune workflow (config 5) and CLI smoke tests."""

import numpy as np
import jax
import pytest

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                           make_synthetic_dataset, make_view_indices)
from cwfa_tpu.engine.ood import detect_ood, finetune_on_novel
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel

N_DEPTHS, VOL_SIDE, IMG, NLENS, VIEW = 8, 32, 96, 4, 32


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ood"))
    info = make_synthetic_dataset(root, n_fish=2, n_frames=2,
                                  n_depths=N_DEPTHS, vol_side=VOL_SIDE,
                                  img_size=IMG, n_lenslets=NLENS,
                                  view_size=VIEW)
    dss = []
    for fd in info["fish_dirs"]:
        dss.append(load_xlfm_data(
            fd + "/SLNet_preprocessed", info["lenslet_file"],
            vol_shape=(VOL_SIDE, VOL_SIDE, N_DEPTHS), img_shape=(IMG, IMG),
            images_to_use=[0, 1], n_depths_to_fill=N_DEPTHS))
    cat = ConcatXLFMDataset(*dss)
    cfg = CWFAConfig(n_depths=N_DEPTHS, volume_side_size=VIEW,
                     n_lenslets=NLENS, INN_max_down_steps=2, INN_n_blocks=1,
                     INN_internal_chans=8, INN_cond_chans=4, epochs=2,
                     eval_every=2).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(dss[0].lenslet_coords, (IMG, IMG), (VIEW, VIEW))
    stats = cat.get_statistics()
    return {"cat": cat, "cfg": cfg, "model": model, "vidx": vidx,
            "stats": stats, "info": info}


def test_ood_detect_and_finetune(rig):
    trainer = CWFATrainer(rig["model"], rig["stats"], rig["vidx"])
    cat = rig["cat"]
    res = detect_ood(trainer, cat)
    assert res.nll_per_frame.shape == (4, 1)
    assert np.isfinite(res.scores).all()
    assert res.threshold == rig["cfg"].step_LL_ths_to_use

    # finetune runs all stages and returns finite losses
    before = np.concatenate([np.asarray(x).ravel() for x in
                             jax.tree_util.tree_leaves(
                                 trainer.params["flow"][0])])
    losses = finetune_on_novel(trainer, cat, optimize_steps=(1, 2),
                               epochs_per_step=1)
    assert set(losses) == {1, 2}
    assert all(np.isfinite(v) for ls in losses.values() for v in ls)

    # the model actually adapted: the optimized steps' PARAMS moved.
    # (Comparing detect_ood scores would be vacuous — every call draws a
    # fresh key and the pyramid injects 1e-3 noise, so scores always
    # differ even with identical weights.)
    after = np.concatenate([np.asarray(x).ravel() for x in
                            jax.tree_util.tree_leaves(
                                trainer.params["flow"][0])])
    assert not np.allclose(before, after)
    res2 = detect_ood(trainer, cat)
    assert np.isfinite(res2.scores).all()


def test_deconvolve_cli(rig, tmp_path):
    from cwfa_tpu.cli.deconvolve import main as deconv_main
    info = rig["info"]
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    out = deconv_main([
        "--data_folder", fish,
        "--psf_file", info["psf_file"],
        "--lenslet_file", info["lenslet_file"],
        "--images_to_use", "0",
        "--n_it", "3",
        "--n_depths", str(N_DEPTHS),
        "--vol_xy_size", str(VOL_SIDE),
        "--img_size", str(IMG),
        "--dark_current", "0",
        "--main_gpu", "0",
    ])
    import glob
    import os
    vols = glob.glob(os.path.join(out, "XLFM_stack_*.tif"))
    assert len(vols) == 1


def test_train_cli_smoke(rig, tmp_path):
    """End-to-end CLI: tiny synthetic tree, 2 epochs, CV fold 0."""
    from cwfa_tpu.cli.train import main as train_main
    info = rig["info"]
    results = train_main([
        "--main_data_path", info["root"],
        "--lenslet_file", info["lenslet_file"],
        "--cross_validation_nFold", "0",
        "--n_depths", str(N_DEPTHS),
        "--volume_side_size", str(VIEW),
        "--img_size", str(IMG),
        "--epochs", "2",
        "--eval_every", "2",
        "--INN_max_down_steps", "2",
        "--INN_n_blocks", "1",
        "--INN_internal_chans", "8",
        "--INN_cond_chans", "4",
        "--max_samples", "2",
        "--output_testing_path", str(tmp_path / "out"),
    ])
    assert "train" in results
    assert len(results["train"]["psnr"]) > 0


def test_train_cli_meshed_smoke(rig, tmp_path):
    """--mesh_data_axis/--mesh_space_axis: the train CLI builds a
    ('data','space') mesh and runs the full schedule SPMD (batch over
    'data', image rows over 'space'); numerics equivalence is covered by
    tests/test_sharding.py::test_trainer_on_mesh_matches_single_device."""
    from cwfa_tpu.cli.train import main as train_main
    info = rig["info"]
    results = train_main([
        "--main_data_path", info["root"],
        "--lenslet_file", info["lenslet_file"],
        "--cross_validation_nFold", "0",
        "--n_depths", str(N_DEPTHS),
        "--volume_side_size", str(VIEW),
        "--img_size", str(IMG),
        "--epochs", "2",
        "--eval_every", "2",
        "--INN_max_down_steps", "2",
        "--INN_n_blocks", "1",
        "--INN_internal_chans", "8",
        "--INN_cond_chans", "4",
        "--max_samples", "2",
        "--batch_size", "2",
        "--mesh_data_axis", "2",
        "--mesh_space_axis", "2",
        "--output_testing_path", str(tmp_path / "out"),
    ])
    assert "train" in results
    assert np.isfinite(np.asarray(results["train"]["psnr"])).all()


def test_ood_detect_batched_matches_batch1(rig):
    """detect_ood honors batch_size with per-frame NLLs identical across
    batch shapes (frames only differ by the noise key draw; share none —
    the forward pyramid's 1e-3 noise makes per-call scores jitter, so
    compare at a tolerance above the noise floor but far below the
    fish-to-fish separation)."""
    import dataclasses as dc
    m1 = CWFAModel.build(dc.replace(rig["cfg"], batch_size=1))
    mN = CWFAModel.build(dc.replace(rig["cfg"], batch_size=4))
    tr1 = CWFATrainer(m1, rig["stats"], rig["vidx"], seed=3)
    trN = CWFATrainer(mN, rig["stats"], rig["vidx"], seed=3)
    r1 = detect_ood(tr1, rig["cat"])
    rN = detect_ood(trN, rig["cat"])
    assert rN.nll_per_frame.shape == r1.nll_per_frame.shape == (4, 1)
    np.testing.assert_allclose(rN.scores, r1.scores, rtol=5e-3, atol=5e-3)


def test_train_cli_xlfmnet_baseline(rig, tmp_path):
    """--INN_net_type 2 dispatches to the XLFMNet baseline trainer
    (reference main.py:99 names it; its switch never constructs it) and
    writes a *_xlfmnet checkpoint."""
    import glob as _glob
    import os

    from cwfa_tpu.cli.train import main as train_main
    info = rig["info"]
    out_root = str(tmp_path / "out")
    results = train_main([
        "--main_data_path", info["root"],
        "--lenslet_file", info["lenslet_file"],
        "--cross_validation_nFold", "0",
        "--INN_net_type", "2",
        "--n_depths", str(N_DEPTHS),
        "--volume_side_size", str(VIEW),
        "--img_size", str(IMG),
        "--epochs", "2",
        "--max_samples", "2",
        "--output_testing_path", out_root,
    ])
    assert results["train"]["psnr"] and results["test"]["psnr"]
    assert np.isfinite(results["train"]["psnr"][0][0])
    cks = _glob.glob(os.path.join(out_root, "*", "xlfmnet_step_*"))
    assert cks, "no XLFMNet checkpoint written"
    # the CWFA checkpoint discovery must NOT pick it up (a step-0 file
    # would restore into cond[-1] via negative indexing)
    from cwfa_tpu.engine.checkpoints import discover_checkpoints
    run_dir = os.path.dirname(cks[0])
    assert discover_checkpoints(run_dir) == {}
    # load roundtrip: spec rebuilt from the stored config, trained params
    # + BN running stats restored, eval-mode forward runs
    from cwfa_tpu.engine.xlfmnet_train import load_xlfmnet
    from cwfa_tpu.models.xlfmnet import init_xlfmnet, xlfmnet
    spec, params, state, cfg_ck, stats_ck = load_xlfmnet(run_dir)
    assert spec.in_views == NLENS and spec.out_depths == N_DEPTHS
    _, state0 = init_xlfmnet(jax.random.PRNGKey(0), spec)
    a = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(state)])
    b = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(state0)])
    assert not np.allclose(a, b), "BN running stats were not restored"
    out = xlfmnet(spec, params, state,
                  np.zeros((1, NLENS, VIEW, VIEW), np.float32),
                  train=False)[0]
    assert out.shape == (1, N_DEPTHS, VIEW, VIEW)
    assert np.isfinite(np.asarray(out)).all()


def test_deconvolve_cli_depth_sharded_matches(rig, tmp_path):
    """--mesh_depth_axis N: the depth-sharded RL path (one psum over the
    mesh axis per iteration) must reproduce the single-device volumes."""
    import glob as _glob
    import os

    from cwfa_tpu.cli.deconvolve import main as deconv_main
    from cwfa_tpu.data.tiff import read_tiff_stack

    info = rig["info"]
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    base = [
        "--data_folder", fish,
        "--psf_file", info["psf_file"],
        "--lenslet_file", info["lenslet_file"],
        "--images_to_use", "0",
        "--n_it", "3",
        "--n_depths", str(N_DEPTHS),
        "--vol_xy_size", str(VOL_SIDE),
        "--img_size", str(IMG),
    ]
    out1 = deconv_main(base + ["--posfix", "_single"])
    out2 = deconv_main(base + ["--posfix", "_sharded",
                               "--mesh_depth_axis", "4"])
    v1 = read_tiff_stack(_glob.glob(os.path.join(out1,
                                                 "XLFM_stack_0*.tif"))[0])
    v2 = read_tiff_stack(_glob.glob(os.path.join(out2,
                                                 "XLFM_stack_0*.tif"))[0])
    # fourier_sum raises the roundoff floor at near-zero-estimate pixels
    # (spectral cancellation: abs error ~1e-7 x PEAK, not ~1e-7 x est),
    # and the RL ratio amplifies the scan-vs-psum sum-association
    # difference there — relative slack at low-signal voxels, tight
    # absolute agreement everywhere (see xlfm_deconvolve's docstring)
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-3)
