"""Host->device feed discipline (round-4 VERDICT weak #1): the trainer must
upload each frame's raw image and GT volume ONCE — the reference re-feeds
every sample every epoch (CWFA.py:789-823), which measured as 97.7% of the
finetune wall on the tunnel rig (docs/results/ood_finetune_r4.log).

Covers:
- transfer accounting: the second epoch performs ZERO re-uploads;
- nll_from_pyramid == forward_pyramid NLLs given the same cache;
- the post-update NLL refresh path runs without volume re-uploads;
- the detect->finetune->re-score OOD cycle uploads each volume once;
- the views cache byte bound evicts without changing results.
"""

import dataclasses

import jax
import numpy as np
import pytest

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                           make_synthetic_dataset, make_view_indices)
from cwfa_tpu.engine.ood import detect_ood, finetune_on_novel
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel

N_DEPTHS, VOL_SIDE, IMG, NLENS, VIEW = 16, 32, 96, 4, 32
N_FRAMES = 3


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_feed"))
    info = make_synthetic_dataset(root, n_fish=1, n_frames=N_FRAMES,
                                  n_depths=N_DEPTHS, vol_side=VOL_SIDE,
                                  img_size=IMG, n_lenslets=NLENS,
                                  view_size=VIEW)
    fish = info["fish_dirs"][0] + "/SLNet_preprocessed"
    ds = load_xlfm_data(fish, info["lenslet_file"],
                        vol_shape=(VOL_SIDE, VOL_SIDE, N_DEPTHS),
                        img_shape=(IMG, IMG),
                        images_to_use=list(range(N_FRAMES)),
                        n_depths_to_fill=N_DEPTHS, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    cfg = CWFAConfig(
        n_depths=N_DEPTHS, volume_side_size=VIEW, n_lenslets=NLENS,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=8,
        INN_cond_chans=4, epochs=6, eval_every=6,
        save_tiff_volumes=0).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(ds.lenslet_coords, (IMG, IMG), (VIEW, VIEW))
    return {"cat": cat, "stats": cat.get_statistics(), "model": model,
            "vidx": vidx, "cfg": cfg}


def _trainer(rig, **kw):
    return CWFATrainer(rig["model"], rig["stats"], rig["vidx"], **kw)


def test_second_epoch_zero_reuploads(rig):
    """Epoch 2 of a stage re-uses the device-cached views + GT pyramids:
    no frame upload, no volume upload, zero h2d bytes from the feed path."""
    tr = _trainer(rig, seed=11)
    tr.ensure_mean_caches(rig["cat"])
    tr.train_epoch(rig["cat"], 0)
    after_first = dict(tr.transfer_log)
    assert after_first["frame_uploads"] == N_FRAMES
    assert after_first["volume_uploads"] == N_FRAMES
    tr.train_epoch(rig["cat"], 1)          # same stage, second epoch
    assert tr.transfer_log == after_first, (
        "second epoch re-uploaded data the device already holds")
    # a later stage (different jitted program) still re-uploads nothing
    eps = max(rig["cfg"].epochs // rig["cfg"].INN_max_down_steps, 1)
    tr.train_epoch(rig["cat"], eps)        # first epoch of the next stage
    assert tr.transfer_log == after_first


def test_nll_from_pyramid_matches_forward(rig):
    """nll_from_pyramid on the cached levels equals forward_pyramid's NLLs
    for the same input (the pyramid is parameter-independent)."""
    tr = _trainer(rig, seed=5)
    vol = np.asarray(rig["cat"].datasets[0].vols[0][None])
    nlls, cache, _, _ = tr._pyramid(tr.params, vol, jax.random.PRNGKey(0))
    recomputed = np.asarray(tr._nll_from_cache(tr.params, list(cache)))
    np.testing.assert_allclose(np.asarray(nlls), recomputed,
                               rtol=1e-5, atol=1e-6)


def test_refresh_after_param_update_no_reupload(rig):
    """Params change -> NLLs stale -> the refresh recomputes from the
    device-cached pyramids with zero volume uploads."""
    tr = _trainer(rig, seed=7)
    r0 = tr.evaluate(rig["cat"], "val", save_volumes=False)
    uploads0 = tr.transfer_log["volume_uploads"]
    tr.params = jax.tree_util.tree_map(lambda x: x * 1.5, tr.params)
    r1 = tr.evaluate(rig["cat"], "val", save_volumes=False)
    assert tr.transfer_log["volume_uploads"] == uploads0
    assert not np.allclose(np.stack(r0["nll"]), np.stack(r1["nll"]))


def test_ood_cycle_uploads_each_volume_once(rig):
    """detect -> finetune(reuse_caches) -> re-score: each frame's volume and
    raw image cross the host->device boundary exactly once."""
    cfg = dataclasses.replace(rig["cfg"], epochs=3)
    model = CWFAModel.build(cfg)
    tr = CWFATrainer(model, rig["stats"], rig["vidx"], seed=3)
    res = detect_ood(tr, rig["cat"], tag="train")
    assert res.nll_per_frame.shape == (N_FRAMES, model.n_flow_steps)
    assert tr.transfer_log["volume_uploads"] == N_FRAMES
    finetune_on_novel(tr, rig["cat"], optimize_steps=(1, 2, 3),
                      epochs_per_step=2, reuse_caches=True)
    post = detect_ood(tr, rig["cat"], tag="train")
    assert tr.transfer_log["volume_uploads"] == N_FRAMES, (
        "the finetune/re-score cycle re-uploaded volumes")
    assert tr.transfer_log["frame_uploads"] == N_FRAMES
    # the re-score really did recompute against the finetuned params
    assert not np.allclose(res.nll_per_frame, post.nll_per_frame)


def test_finetune_without_reuse_still_clears(rig):
    """Default reuse_caches=False drops the train-tag caches (a different
    dataset's indices must not alias stale entries)."""
    cfg = dataclasses.replace(rig["cfg"], epochs=3)
    model = CWFAModel.build(cfg)
    tr = CWFATrainer(model, rig["stats"], rig["vidx"], seed=3)
    detect_ood(tr, rig["cat"], tag="train")
    n0 = tr.transfer_log["volume_uploads"]
    finetune_on_novel(tr, rig["cat"], optimize_steps=(3,),
                      epochs_per_step=1)
    assert tr.transfer_log["volume_uploads"] == n0 + N_FRAMES


def test_detect_ood_distinct_datasets_do_not_alias(rig):
    """Two DIFFERENT datasets scored back-to-back must not return each
    other's cached NLLs (regression: the cache-routed detect_ood aliased
    (tag, frame-index) across datasets, making every novel fish score
    exactly its predecessor's NLLs)."""
    import copy
    base = rig["cat"].datasets[0]
    ds_a, ds_b = copy.copy(base), copy.copy(base)
    ds_a.stacked_views = base.stacked_views[0:1]
    ds_a.vols = base.vols[0:1]
    ds_a.n_images = 1
    ds_b.stacked_views = base.stacked_views[1:2]
    ds_b.vols = base.vols[1:2] * 1.7 + 0.3     # materially different frames
    ds_b.n_images = 1
    cat_a = ConcatXLFMDataset.__new__(ConcatXLFMDataset)
    cat_a.datasets = [ds_a]
    cat_b = ConcatXLFMDataset.__new__(ConcatXLFMDataset)
    cat_b.datasets = [ds_b]
    tr = _trainer(rig, seed=13)
    ra = detect_ood(tr, cat_a)
    rb = detect_ood(tr, cat_b)
    assert not np.allclose(ra.nll_per_frame, rb.nll_per_frame), (
        "distinct datasets returned identical NLLs — cache aliasing")
    # re-scoring the SAME dataset object with unchanged params is cached
    uploads = tr.transfer_log["volume_uploads"]
    ra2 = detect_ood(tr, cat_a)
    np.testing.assert_array_equal(ra.nll_per_frame, ra2.nll_per_frame)
    assert tr.transfer_log["volume_uploads"] == uploads


def test_views_cache_byte_bound(rig):
    """With a bound below the dataset's footprint the views cache evicts
    (re-uploading evicted frames) but training stays correct."""
    tr = _trainer(rig, seed=9)
    tr.ensure_mean_caches(rig["cat"])
    one = np.asarray(
        tr._views_for(rig["cat"], "train", 0)).nbytes
    tr.views_cache = {}
    tr._views_cache_order = []
    tr.transfer_log["frame_uploads"] = 0
    tr.views_cache_max_bytes = int(one * 1.5)    # holds ~1 frame
    loss0 = tr.train_epoch(rig["cat"], 0)
    loss1 = tr.train_epoch(rig["cat"], 1)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert len(tr.views_cache) <= 2
    assert tr.transfer_log["frame_uploads"] > N_FRAMES   # eviction cycled
