"""End-to-end serve-CLI test: save a checkpoint (params + stats + mean
caches), then serve a directory of camera frames from it with no training
dataset present."""

import os

import numpy as np
import pytest

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                           make_synthetic_dataset, make_view_indices)
from cwfa_tpu.data.tiff import read_tiff_stack, write_tiff_stack
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel

ND, VOL, VIEW, IMG, NL = 8, 32, 32, 96, 4


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    """One synthetic dataset + saved checkpoint + 4 camera frames, shared
    by both CLI tests (the setup costs dominate on the 1-core host)."""
    root = tmp_path_factory.mktemp("serve_cli")
    info = make_synthetic_dataset(
        str(root / "data"), n_fish=1, n_frames=2, n_depths=ND,
        vol_side=VOL, img_size=IMG, n_lenslets=NL, view_size=VIEW)
    ds = load_xlfm_data(
        info["fish_dirs"][0] + "/SLNet_preprocessed", info["lenslet_file"],
        vol_shape=(VOL, VOL, ND), img_shape=(IMG, IMG),
        images_to_use=[0, 1], n_depths_to_fill=ND, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    cfg = CWFAConfig(
        n_depths=ND, volume_side_size=VIEW, n_lenslets=NL,
        INN_max_down_steps=2, INN_n_blocks=2, INN_internal_chans=4,
        INN_cond_chans=2, lenslet_file=info["lenslet_file"],
        save_tiff_volumes=0).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(ds.lenslet_coords, (IMG, IMG), (VIEW, VIEW))
    ckpt = str(root / "ckpt")
    trainer = CWFATrainer(model, cat.get_statistics(), vidx,
                          output_path=ckpt)
    trainer.ensure_mean_caches(cat)
    trainer.save_checkpoints(epoch=0)

    in_dir = root / "frames"
    in_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(4):
        write_tiff_stack(str(in_dir / f"cam_{i}.tif"),
                         (rng.rand(IMG, IMG) * 100).astype(np.float32))

    base = [
        "--pretrain_models_path", ckpt,
        "--lenslet_file", info["lenslet_file"],
        "--img_size", str(IMG),
        "--n_depths", str(ND), "--volume_side_size", str(VIEW),
        "--INN_max_down_steps", "2", "--INN_n_blocks", "2",
        "--INN_internal_chans", "4", "--INN_cond_chans", "2",
        "--in_dir", str(in_dir), "--batch", "2", "--no_int8",
    ]
    return {"root": root, "base": base}


def test_serve_cli_from_checkpoint(rig):
    from cwfa_tpu.cli import serve
    out_dir = rig["root"] / "vols"
    serve.main(rig["base"] + ["--out_dir", str(out_dir)])
    vols = sorted(os.listdir(out_dir))
    assert len(vols) == 4
    v = read_tiff_stack(str(out_dir / vols[0]))
    assert v.shape == (ND, VIEW, VIEW)
    assert np.isfinite(v).all()


def test_serve_cli_meshed_matches_single_device(rig):
    """--mesh_data_axis/--mesh_space_axis: the meshed serving path (batch
    over 'data', image rows over 'space') must produce the same volumes as
    the single-device path — the flags' consumer (cli/serve.py) on the
    8-virtual-device CPU platform."""
    from cwfa_tpu.cli import serve
    out_1, out_m = rig["root"] / "vols1", rig["root"] / "volsm"
    serve.main(rig["base"] + ["--out_dir", str(out_1)])
    serve.main(rig["base"] + ["--out_dir", str(out_m),
                              "--mesh_data_axis", "2",
                              "--mesh_space_axis", "2"])
    names = sorted(os.listdir(out_1))
    assert names == sorted(os.listdir(out_m)) and len(names) == 4
    for n in names:
        a = read_tiff_stack(str(out_1 / n))
        b = read_tiff_stack(str(out_m / n))
        # bf16 compute + sharded reduction order: same bound as the
        # driver dryrun's sharded-vs-single check (__graft_entry__.py)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9)
        assert rel < 5e-2, (n, rel)


def test_serve_cli_survives_wrong_shaped_frame(rig):
    """A readable TIFF with the wrong frame shape (a stray thumbnail)
    must be skipped with a message, not kill the service (round-4 review
    fix: submit's ValueError was previously raised outside the quarantine
    try/except)."""
    from cwfa_tpu.cli import serve
    in2 = rig["root"] / "frames_bad"
    in2.mkdir()
    rng = np.random.RandomState(3)
    for i in range(2):
        write_tiff_stack(str(in2 / f"cam_{i}.tif"),
                         (rng.rand(IMG, IMG) * 100).astype(np.float32))
    write_tiff_stack(str(in2 / "thumb.tif"),
                     (rng.rand(16, 16) * 100).astype(np.float32))
    out_dir = rig["root"] / "vols_bad"
    args = list(rig["base"])
    args[args.index("--in_dir") + 1] = str(in2)
    serve.main(args + ["--out_dir", str(out_dir)])
    vols = sorted(os.listdir(out_dir))
    assert len(vols) == 2           # the two good frames; thumb skipped
