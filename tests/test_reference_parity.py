"""Numerical parity against the ACTUAL reference implementation.

These tests import the reference PyTorch code read-only from /root/reference
(skipped when unavailable), build its networks with seeded init, convert the
torch state dicts through cwfa_tpu.engine.torch_convert, and compare forward/
reverse outputs element-wise.  This is the strongest correctness artifact:
same weights, same inputs, two independent implementations.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    # stub the IO deps the reference imports but these tests never touch
    for name, attrs in (("tifffile", ("imread", "imsave")),
                        ("multipagetiff", ("read_stack",))):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, lambda *args, **kw: None)
            sys.modules[name] = m
    # numpy 2.x dropped numpy.lib.arraysetops (reference INN_utils.py:4)
    if "numpy.lib.arraysetops" not in sys.modules:
        shim = types.ModuleType("numpy.lib.arraysetops")
        shim.isin = np.isin
        sys.modules["numpy.lib.arraysetops"] = shim
    # torchvision isn't in this image (unet.py:4 imports it unused here)
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    # sklearn / pandas / lion are pulled by CWFA.py only; networks.py's
    # wildcard import of utils.py needs scipy + matplotlib (present)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    networks = __import__("networks")
    return networks


SEED = 364898
D, S, NB, ICH = 16, 32, 2, 8  # depths, spatial, blocks, internal chans


def _build_reference_step(networks):
    """Seeded reference CWF step + cond net (n_down_steps=1 -> kept graph)."""
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    cond_ctor = lambda: networks.cond_network(4, D // 2, 1, 5, [], 4)
    cond_net, graphs = networks.conditional_wavelet_flow(
        input_volume_shape=(D, S, S), condition_shape=(1, 4, S, S),
        st_subnet=networks.wavelet_flow_subnetwork2D,
        conditional_network=cond_ctor, n_down_steps=1,
        use_permutations=True, block_type="CAT", n_internal_ch=ICH,
        n_blocks=NB, disable_low_res_input=False, device="cpu")
    return cond_net.eval(), graphs[0].eval()


@pytest.fixture(scope="module")
def converted(ref_modules):
    from cwfa_tpu.engine.torch_convert import (apply_perm_overrides,
                                               convert_cond_network,
                                               convert_graph_inn)
    from cwfa_tpu.models.cwf import build_step_specs

    cond_net, graph = _build_reference_step(ref_modules)
    sd = {k: v.detach().numpy() for k, v in graph.state_dict().items()}
    params, perms = convert_graph_inn(sd, n_blocks=NB, use_final_perm=True)
    spec = build_step_specs(
        n_depths=D, spatial=S, n_flow_steps=1, n_blocks=NB,
        block_type="CAT", internal_ch=ICH, use_bias=True,
        use_final_perm=True, disable_low_res_input=False,
        global_seed=SEED)[0]
    csd = {k: v.detach().numpy() for k, v in cond_net.state_dict().items()}
    cond_params = convert_cond_network(csd)
    return {"ref_graph": graph, "ref_cond": cond_net, "spec": spec,
            "params": params, "perms": perms, "cond_params": cond_params}


def test_permutation_replay_matches_reference_buffers(converted):
    """The numpy-RNG replay must reproduce the reference's actual perm
    buffers (incl. the PermuteDim pre-seed axis-choice walk)."""
    spec = converted["spec"]
    for entry, (perm, inv) in zip(spec.perms, converted["perms"]):
        np.testing.assert_array_equal(entry[-2], perm)
        np.testing.assert_array_equal(entry[-1], inv)


def test_forward_parity(converted):
    import jax.numpy as jnp
    from cwfa_tpu.models.cwf import cwf_step_forward

    rng = np.random.RandomState(0)
    vol = rng.randn(1, D, S, S).astype(np.float32)
    cv = rng.randn(1, D // 2, S, S).astype(np.float32)
    cm = rng.randn(1, D // 2, S, S).astype(np.float32)

    with torch.no_grad():
        # GraphINN condition order: [Condition I (views), Condition (mean)]
        (z_ref, avg_ref), ld_ref = converted["ref_graph"](
            torch.from_numpy(vol),
            c=[torch.from_numpy(cv), torch.from_numpy(cm)])
    z, avg, ld = cwf_step_forward(converted["spec"], converted["params"],
                                  jnp.asarray(vol), jnp.asarray(cv),
                                  jnp.asarray(cm))
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(avg), avg_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-3,
                               atol=1e-2)


def test_reverse_parity(converted):
    import jax.numpy as jnp
    from cwfa_tpu.models.cwf import cwf_step_reverse

    rng = np.random.RandomState(1)
    z = rng.randn(1, D // 2, S, S).astype(np.float32)
    avg = rng.randn(1, D // 2, S, S).astype(np.float32)
    cv = rng.randn(1, D // 2, S, S).astype(np.float32)
    cm = rng.randn(1, D // 2, S, S).astype(np.float32)

    with torch.no_grad():
        # GraphINN returns a bare tensor when there is a single output
        vol_ref, ld_ref = converted["ref_graph"](
            [torch.from_numpy(z), torch.from_numpy(avg)],
            c=[torch.from_numpy(cv), torch.from_numpy(cm)], rev=True)
    vol, ld = cwf_step_reverse(converted["spec"], converted["params"],
                               jnp.asarray(z), jnp.asarray(avg),
                               jnp.asarray(cv), jnp.asarray(cm))
    np.testing.assert_allclose(np.asarray(vol), vol_ref.numpy(), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), ld_ref.numpy(), rtol=1e-3,
                               atol=1e-2)


def test_cond_network_parity(converted):
    import jax.numpy as jnp
    from cwfa_tpu.models.cond_net import cond_network

    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, S, S).astype(np.float32)
    with torch.no_grad():
        ref = converted["ref_cond"](torch.from_numpy(x))[-1].numpy()
    for impl in ("direct", "banded"):
        got = cond_network(converted["cond_params"], jnp.asarray(x),
                           train=False, conv3d_impl=impl)
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4,
                                   rtol=1e-3, err_msg=impl)


def test_lrnn_parity(ref_modules, monkeypatch):
    """Encoder/LRNN without the mean-volume branch (the reference's ConvNeXt
    LayerNorm hard-codes 512^2 shapes; the views->volume path is the core).
    The reference's functional F.dropout2d defaults to training=True even in
    eval (unet.py:80,86) — patched to identity for a deterministic oracle;
    our implementation gates dropout on the train flag (documented
    divergence)."""
    import torch.nn.functional as F
    monkeypatch.setattr(F, "dropout2d", lambda x, *a, **k: x)

    import jax.numpy as jnp
    from cwfa_tpu.engine.torch_convert import convert_lrnn
    from cwfa_tpu.models.lrnn import LRNNSpec, lrnn

    torch.manual_seed(7)
    enc = ref_modules.Encoder(4, 4, 1, [], use_bias=False).eval()
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params, state = convert_lrnn(sd)

    spec = LRNNSpec(ch_in=4, n_depths=4, spatial=S, use_bias=False)
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, S, S).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x))[-1].numpy()
    got, _ = lrnn(spec, params, state, jnp.asarray(x), None, train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)


def test_multistep_permutation_walk(ref_modules):
    """run_CWFA calls conditional_wavelet_flow once per pyramid step with
    n_down_steps=ix+1 (CWFA.py:478-510); the numpy RNG walks through all
    calls. The replayer must reproduce every kept graph's perm buffers."""
    import INN_utils
    from cwfa_tpu.models.cwf import build_step_specs

    networks = ref_modules
    n_depths, spatial, n_blocks = 16, 16, 4
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    ref_perms_per_step = []
    for ix in range(3):
        cond_ctor = lambda ixx=ix: networks.cond_network(
            4, n_depths // (2 ** (ixx + 1)), ixx + 1, 5, [], 4)
        _, graphs = networks.conditional_wavelet_flow(
            (n_depths, spatial, spatial), (1, 4, spatial, spatial),
            networks.wavelet_flow_subnetwork2D, cond_ctor,
            n_down_steps=ix + 1, use_permutations=True, block_type="CAT",
            n_internal_ch=4, n_blocks=n_blocks, device="cpu")
        kept = graphs[ix]
        perms = []
        for m in kept.module_list:
            if hasattr(m, "perm") and not isinstance(m, INN_utils.PermuteDim):
                perms.append(("channel", m.perm.numpy()))
            elif isinstance(m, INN_utils.PermuteDim):
                perms.append(("spatial",
                              3 if m.dims_to_permute[1] == 3 else 2,
                              m.perm.numpy()))
        ref_perms_per_step.append(perms)

    specs = build_step_specs(n_depths, spatial, 3, n_blocks, "CAT", 4,
                             True, True, False, SEED)
    for spec, ref_perms in zip(specs, ref_perms_per_step):
        assert len(spec.perms) == len(ref_perms)
        for mine, ref in zip(spec.perms, ref_perms):
            assert mine[0] == ref[0]
            if ref[0] == "spatial":
                assert mine[1] == ref[1], "PermuteDim axis diverged"
            np.testing.assert_array_equal(mine[-2], ref[-1])


def test_load_torch_checkpoints_into_trainer(ref_modules, tmp_path):
    """End-to-end: a reference-format torch checkpoint file loads into the
    trainer (discovery + conversion + spec patching) and reproduces the
    reference graph's forward output."""
    import jax.numpy as jnp
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data.stats import DatasetStatistics
    from cwfa_tpu.data.views import make_view_indices
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel
    from cwfa_tpu.models.cwf import cwf_step_forward

    cond_net, graph = _build_reference_step(ref_modules)
    ckpt = {"epoch": 5, "args": None,
            "INN_state_dict": graph.state_dict(),
            "condition_state_dict": cond_net.state_dict(),
            "optimizer_state_dict": None, "training_statistics": []}
    torch.save(ckpt, str(tmp_path / "model_step_1__ep_5"))

    cfg = CWFAConfig(n_depths=D, volume_side_size=S, n_lenslets=4,
                     INN_max_down_steps=2, INN_n_blocks=NB,
                     INN_internal_chans=ICH, INN_cond_chans=4).decode_lrs()
    model = CWFAModel.build(cfg)
    stats = DatasetStatistics(0, 1, 0, 1, 0, 1)
    coords = np.array([[40, 40], [40, 80], [80, 40], [80, 80]])
    vidx = make_view_indices(coords, (128, 128), (S, S))
    trainer = CWFATrainer(model, stats, vidx)
    loaded = trainer.load_torch_checkpoints(str(tmp_path), steps=[1])
    assert loaded == [1]

    rng = np.random.RandomState(4)
    vol = rng.randn(1, D, S, S).astype(np.float32)
    cv = rng.randn(1, D // 2, S, S).astype(np.float32)
    cm = rng.randn(1, D // 2, S, S).astype(np.float32)
    with torch.no_grad():
        (z_ref, _), _ = graph(torch.from_numpy(vol),
                              c=[torch.from_numpy(cv), torch.from_numpy(cm)])
    z, _, _ = cwf_step_forward(trainer.model.step_specs[0],
                               trainer.params["flow"][0],
                               jnp.asarray(vol), jnp.asarray(cv),
                               jnp.asarray(cm))
    np.testing.assert_allclose(np.asarray(z), z_ref.numpy(), atol=2e-4,
                               rtol=1e-4)


def test_export_roundtrip_graph(converted, ref_modules):
    """torch_export.export_graph_inn must produce a state dict the
    REFERENCE model itself accepts with strict=True and that reproduces
    the original forward (zero-filled unused dual blocks are dead in the
    reference forward)."""
    import jax.numpy as jnp
    from cwfa_tpu.engine.torch_export import export_graph_inn

    sd = export_graph_inn(converted["spec"], converted["params"])
    _, fresh = _build_reference_step(ref_modules)
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    rng = np.random.RandomState(11)
    vol = rng.randn(1, D, S, S).astype(np.float32)
    cv = rng.randn(1, D // 2, S, S).astype(np.float32)
    cm = rng.randn(1, D // 2, S, S).astype(np.float32)
    with torch.no_grad():
        (z_a, avg_a), ld_a = converted["ref_graph"](
            torch.from_numpy(vol),
            c=[torch.from_numpy(cv), torch.from_numpy(cm)])
        (z_b, avg_b), ld_b = fresh(
            torch.from_numpy(vol),
            c=[torch.from_numpy(cv), torch.from_numpy(cm)])
    np.testing.assert_allclose(z_b.numpy(), z_a.numpy(), atol=1e-6)
    np.testing.assert_allclose(avg_b.numpy(), avg_a.numpy(), atol=1e-6)
    np.testing.assert_allclose(ld_b.numpy(), ld_a.numpy(), atol=1e-5)


def test_export_roundtrip_cond(converted, ref_modules):
    from cwfa_tpu.engine.torch_export import export_cond_network

    sd = export_cond_network(converted["cond_params"])
    np.random.seed(SEED)
    torch.manual_seed(SEED)
    fresh = ref_modules.cond_network(4, D // 2, 1, 5, [], 4).eval()
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    rng = np.random.RandomState(12)
    x = rng.randn(1, 4, S, S).astype(np.float32)
    with torch.no_grad():
        ref = converted["ref_cond"](torch.from_numpy(x))[-1].numpy()
        got = fresh(torch.from_numpy(x))[-1].numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_export_roundtrip_lrnn(ref_modules, monkeypatch):
    """Export our converted LRNN back into a fresh reference Encoder
    (strict), forward-compare without the mean branch (its LayerNorm
    hard-codes 512^2; the reference's always-training F.dropout2d is
    patched to identity exactly as in test_lrnn_parity)."""
    import torch.nn.functional as F
    monkeypatch.setattr(F, "dropout2d", lambda x, *a, **k: x)
    from cwfa_tpu.engine.torch_convert import convert_lrnn
    from cwfa_tpu.engine.torch_export import export_lrnn

    torch.manual_seed(7)
    enc = ref_modules.Encoder(4, 4, 1, [], use_bias=False).eval()
    sd0 = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    params, state = convert_lrnn(sd0)
    sd = export_lrnn(params, state)
    torch.manual_seed(8)
    fresh = ref_modules.Encoder(4, 4, 1, [], use_bias=False).eval()
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    rng = np.random.RandomState(13)
    x = rng.randn(1, 4, S, S).astype(np.float32)
    with torch.no_grad():
        a = enc(torch.from_numpy(x))[-1].numpy()
        b = fresh(torch.from_numpy(x))[-1].numpy()
    np.testing.assert_allclose(b, a, atol=1e-6)


def test_param_name_order_matches_reference_parameters(converted,
                                                       ref_modules):
    """graph_param_names/lrnn_param_names (the index mapping of the
    exported lion_pytorch optimizer state) must equal the LIVE reference
    model's named_parameters() order — torch optimizers key state by
    parameter position."""
    from cwfa_tpu.engine.torch_export import (export_graph_inn, export_lrnn,
                                              graph_param_names,
                                              lrnn_param_names)
    from cwfa_tpu.engine.torch_convert import convert_lrnn

    sd = export_graph_inn(converted["spec"], converted["params"])
    ref_order = [n for n, _ in converted["ref_graph"].named_parameters()]
    assert graph_param_names(sd) == ref_order

    torch.manual_seed(7)
    enc = ref_modules.Encoder(4, 4, 1, [], use_bias=False).eval()
    params, state = convert_lrnn(
        {k: v.detach().numpy() for k, v in enc.state_dict().items()})
    lsd = export_lrnn(params, state)
    ref_order = [n for n, _ in enc.named_parameters()]
    assert lrnn_param_names(lsd) == ref_order
