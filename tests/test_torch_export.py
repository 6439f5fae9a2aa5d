"""Full-cycle checkpoint interop: export a cwfa_tpu model as reference
``model_step_<s>__ep_<e>`` torch files (engine/torch_export.py), then load
them back through the trainer's reference-checkpoint path
(load_torch_checkpoints -> engine/torch_convert) and require parameter
equality — TPU -> torch -> TPU is lossless.  (The torch -> reference-model
direction is pinned by the strict-load round-trips in
tests/test_reference_parity.py.)"""

import numpy as np
import jax
import pytest

pytest.importorskip("torch")

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.data.views import make_view_indices
from cwfa_tpu.engine.torch_export import export_torch_checkpoints
from cwfa_tpu.engine.trainer import CWFATrainer
from cwfa_tpu.models.cwfa_model import CWFAModel


def test_export_then_load_torch_checkpoints_roundtrip(tmp_path):
    cfg = CWFAConfig(n_depths=8, volume_side_size=16, n_lenslets=4,
                     INN_max_down_steps=2, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4).decode_lrs()
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(5))
    # nontrivial BN running stats must survive the cycle by VALUE
    mstate = jax.tree_util.tree_map(
        lambda x: x + (0.25 if np.issubdtype(np.asarray(x).dtype,
                                             np.floating) else 0), mstate)
    stats = DatasetStatistics(10.0, 5.0, 10.0, 5.0, 1.0, 0.5)

    out = str(tmp_path / "ckpt")
    written = export_torch_checkpoints(out, cfg, model, params, mstate,
                                       stats=stats, epoch=3)
    assert len(written) == model.n_flow_steps + 1

    coords = np.array([[8, 8], [8, 40], [40, 8], [40, 40]])
    vidx = make_view_indices(coords, (64, 64), (16, 16))
    tr = CWFATrainer(model, stats, vidx, seed=1)
    loaded = tr.load_torch_checkpoints(out)
    assert len(loaded) == model.n_flow_steps + 1

    for k in range(model.n_flow_steps):
        a = jax.tree_util.tree_leaves(params["flow"][k])
        b = jax.tree_util.tree_leaves(tr.params["flow"][k])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)
        a = jax.tree_util.tree_leaves(params["cond"][k])
        b = jax.tree_util.tree_leaves(tr.params["cond"][k])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-6)
        # permutation buffers survive the cycle
        for e_new, e_old in zip(tr.model.step_specs[k].perms,
                                model.step_specs[k].perms):
            np.testing.assert_array_equal(e_new[-2], e_old[-2])
            np.testing.assert_array_equal(e_new[-1], e_old[-1])
    a = jax.tree_util.tree_leaves(params["lrnn"])
    b = jax.tree_util.tree_leaves(tr.params["lrnn"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # BN running stats ride along by value (mean/var; the count leaf is
    # reset — torch's num_batches_tracked does not map onto it)
    for side in ("down", "up"):
        for blk_a, blk_b in zip(mstate["lrnn"]["unet"][side],
                                tr.mstate["lrnn"]["unet"][side]):
            for tag in ("bn1", "bn2"):
                for f in ("mean", "var"):
                    np.testing.assert_allclose(
                        np.asarray(blk_a[tag][f]),
                        np.asarray(blk_b[tag][f]), atol=1e-6)


def test_export_torch_cli_end_to_end(tmp_path):
    """msgpack checkpoints -> cli.export_torch -> torch files that import
    back to the same parameters (config + stats read from the payloads)."""
    from cwfa_tpu.engine.checkpoints import save_step_checkpoint
    from cwfa_tpu.cli.export_torch import main as export_main
    from cwfa_tpu.engine import torch_convert as tc

    cfg = CWFAConfig(n_depths=8, volume_side_size=16, n_lenslets=4,
                     INN_max_down_steps=2, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4).decode_lrs()
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(9))
    stats = DatasetStatistics(10.0, 5.0, 10.0, 5.0, 1.0, 0.5)
    src = str(tmp_path / "msgpack")
    nf = model.n_flow_steps
    for k in range(nf):
        save_step_checkpoint(src, k + 1, 7, cfg,
                             inn_params=params["flow"][k],
                             cond_params=params["cond"][k],
                             train_statistics=stats)
    save_step_checkpoint(src, nf + 1, 7, cfg,
                         cond_params=params["lrnn"],
                         train_statistics=stats,
                         model_state=mstate["lrnn"])

    out = str(tmp_path / "torch")
    export_main(["--pretrain_models_path", src, "--output_path", out])

    import os
    files = sorted(os.listdir(out))
    assert files == [f"model_step_{s}__ep_7" for s in range(1, nf + 2)]
    payload = tc.load_torch_state_dict(os.path.join(out, "model_step_1__ep_7"))
    fparams, perms = tc.convert_graph_inn(payload["INN_state_dict"],
                                          n_blocks=cfg.INN_n_blocks,
                                          use_final_perm=True)
    a = jax.tree_util.tree_leaves(params["flow"][0])
    b = jax.tree_util.tree_leaves(fparams)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    assert len(payload["training_statistics"]) == 6


def test_export_torch_cli_empty_dir_errors(tmp_path):
    from cwfa_tpu.cli.export_torch import main as export_main
    with pytest.raises(SystemExit):
        export_main(["--pretrain_models_path", str(tmp_path),
                     "--output_path", str(tmp_path / "out")])


def test_export_torch_cli_missing_step_errors(tmp_path):
    """A step without a msgpack checkpoint must be a hard error — exporting
    it would write random-init weights the reference strict-loads."""
    from cwfa_tpu.engine.checkpoints import save_step_checkpoint
    from cwfa_tpu.cli.export_torch import main as export_main

    cfg = CWFAConfig(n_depths=8, volume_side_size=16, n_lenslets=4,
                     INN_max_down_steps=2, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4).decode_lrs()
    model = CWFAModel.build(cfg)
    params, _ = model.init(jax.random.PRNGKey(2))
    src = str(tmp_path / "partial")
    save_step_checkpoint(src, 1, 3, cfg, inn_params=params["flow"][0],
                         cond_params=params["cond"][0])
    with pytest.raises(SystemExit, match="no .msgpack checkpoint"):
        export_main(["--pretrain_models_path", src,
                     "--output_path", str(tmp_path / "out")])
