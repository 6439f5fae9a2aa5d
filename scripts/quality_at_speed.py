"""Quality-at-speed artifact (VERDICT r2 #6): one log tying the bench-config
fast path to reference-checkpoint PSNR.

Two parts:

1. **Converted reference checkpoint through the shipped fast path** at the
   FLAGSHIP config: builds the actual PyTorch reference networks
   (/root/reference/networks.py) with seeded init at 512x512x96/29-lenslet
   scale, serializes reference-format ``model_step_*__ep_*`` checkpoints
   (torch.save dicts, networks.py:708-730), loads them through
   ``CWFATrainer.load_torch_checkpoints``, and reconstructs the same frames
   through (a) the reference-faithful bf16 path and (b) the SHIPPED bench
   path (int8 UNet + 'mid' input-tower pairing — the exact BENCH_r03
   configuration).  Reports the pipeline-agreement PSNR between the two.
   (No *trained* reference checkpoint ships with the reference repo; seeded
   init exercises the full convert -> fast-path stack at scale.)

2. **Trained-model quality at speed**: trains the synthetic config, then
   reports PSNR vs GT through the same two paths (the trained-weights
   tolerance check, extending scripts/int8_quality_check.py to the exact
   shipped configuration).

Usage: python scripts/quality_at_speed.py [train_epochs] | tee docs/results/quality_at_speed_r3.log
"""
import os
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def psnr(a, b, peak=None):
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    peak = peak or float(np.abs(b).max())
    return 10.0 * np.log10(peak ** 2 / mse)


def _import_reference():
    import torch  # noqa: F401
    for name, attrs in (("tifffile", ("imread", "imsave")),
                        ("multipagetiff", ("read_stack",))):
        if name not in sys.modules:
            m = types.ModuleType(name)
            for a in attrs:
                setattr(m, a, lambda *args, **kw: None)
            sys.modules[name] = m
    if "numpy.lib.arraysetops" not in sys.modules:
        shim = types.ModuleType("numpy.lib.arraysetops")
        shim.isin = np.isin
        sys.modules["numpy.lib.arraysetops"] = shim
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return __import__("networks")


def build_reference_checkpoints(out_dir, cfg):
    """Seeded reference networks at cfg's scale, serialized in the
    reference's own checkpoint format (networks.py:708-730)."""
    import torch
    networks = _import_reference()
    np.random.seed(cfg.seed)
    torch.manual_seed(cfg.seed)
    d, s = cfg.n_depths, cfg.volume_side_size
    nl, ich = cfg.n_lenslets, cfg.INN_internal_chans
    t0 = time.time()
    with torch.no_grad():
        for step in range(1, cfg.INN_max_down_steps + 1):
            if step < cfg.INN_max_down_steps:
                cond_ctor = lambda: networks.cond_network(
                    nl, d // (2 ** step), 1, 5, [], cfg.INN_cond_chans)
                cond_net, graphs = networks.conditional_wavelet_flow(
                    input_volume_shape=(d, s, s),
                    condition_shape=(1, nl, s, s),
                    st_subnet=networks.wavelet_flow_subnetwork2D,
                    conditional_network=cond_ctor, n_down_steps=step,
                    use_permutations=True, block_type="CAT",
                    n_internal_ch=ich, n_blocks=cfg.INN_n_blocks,
                    disable_low_res_input=False, device="cpu")
                graph = graphs[step - 1]
                inn_sd = graph.state_dict()
                cond_sd = cond_net.state_dict()
            else:
                enc = networks.Encoder(
                    nl, d // (2 ** (cfg.INN_max_down_steps - 1)), 1, [], 0)
                inn_sd = {}
                cond_sd = enc.state_dict()
            torch.save({"epoch": 1, "args": {}, "INN_state_dict": inn_sd,
                        "condition_state_dict": cond_sd,
                        "optimizer_state_dict": {},
                        "training_statistics": []},
                       os.path.join(out_dir, f"model_step_{step}__ep_1"))
            print(f"  reference step {step} serialized "
                  f"({time.time()-t0:.1f}s)", flush=True)


def flagship_agreement():
    import jax
    import jax.numpy as jnp
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data.stats import DatasetStatistics
    from cwfa_tpu.data.views import make_view_indices
    from cwfa_tpu.engine.inference import XLFMReconstructor
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    cfg = CWFAConfig().decode_lrs()
    img = 2160
    ckdir = tempfile.mkdtemp(prefix="refck_")
    print("[1] building + serializing seeded REFERENCE networks at flagship "
          "scale...", flush=True)
    build_reference_checkpoints(ckdir, cfg)

    model = CWFAModel.build(cfg)
    stats = DatasetStatistics(100.0, 50.0, 100.0, 50.0, 10.0, 5.0)
    trainer = CWFATrainer(model, stats, None)
    loaded = trainer.load_torch_checkpoints(ckdir)
    print(f"  converted reference checkpoint steps: {loaded}", flush=True)

    side = cfg.volume_side_size
    g = int(np.ceil(np.sqrt(cfg.n_lenslets)))
    half = side // 2
    xs = np.linspace(half, img - half, g).astype(np.int64)
    coords = np.array([(x, y) for x in xs for y in xs][:cfg.n_lenslets])
    vidx = make_view_indices(coords, (img, img), (side, side))
    key = jax.random.PRNGKey(1)
    nf = trainer.model.n_flow_steps
    mean_caches = [jax.random.normal(
        jax.random.fold_in(key, k),
        (1, cfg.n_depths // (2 ** (k + 1)), side, side)) * 0.1
        for k in range(nf + 1)]
    batch = 4
    frames = jax.random.uniform(key, (batch, img, img), jnp.float32) * 1000

    mk = lambda **kw: XLFMReconstructor(
        trainer.model, trainer.params, trainer.mstate, stats, vidx,
        mean_caches, deterministic=True, compute_dtype=jnp.bfloat16, **kw)
    print("[1] reconstructing through the reference-faithful bf16 path...",
          flush=True)
    ref_path = mk(use_int8=False, pair_input_towers=False)
    vol_ref = np.asarray(ref_path(frames))
    print("[1] reconstructing through the SHIPPED bench path (int8 UNet + "
          "mid pairing)...", flush=True)
    fast = mk(use_int8=True, calib_frames=frames, pair_input_towers="mid")
    t0 = time.perf_counter()
    vol_fast = np.asarray(fast(frames))
    print(f"  fast-path wall (incl. fetch): {time.perf_counter()-t0:.2f}s")
    agree = psnr(vol_fast, vol_ref)
    print(f"[1] FLAGSHIP converted-reference pipeline agreement "
          f"(shipped fast path vs bf16 path): {agree:.2f} dB", flush=True)
    fps = fast.throughput(frames, n_repeats=5)
    print(f"[1] shipped-path throughput at batch {batch}: {fps:.2f} fps",
          flush=True)
    return agree


def trained_quality(epochs):
    import jax.numpy as jnp
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data import (ConcatXLFMDataset, load_xlfm_data,
                               make_synthetic_dataset, make_view_indices)
    from cwfa_tpu.engine.inference import XLFMReconstructor
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cwfa_model import CWFAModel

    nd, vs, img, nl = 16, 64, 192, 9
    root = tempfile.mkdtemp(prefix="qas_")
    info = make_synthetic_dataset(root, n_fish=1, n_frames=6, n_depths=nd,
                                  vol_side=vs, img_size=img, n_lenslets=nl,
                                  view_size=vs)
    ds = load_xlfm_data(info["fish_dirs"][0] + "/SLNet_preprocessed",
                        info["lenslet_file"], vol_shape=(vs, vs, nd),
                        img_shape=(img, img), images_to_use=list(range(6)),
                        n_depths_to_fill=nd, ds_id="fish_0")
    cat = ConcatXLFMDataset(ds)
    cfg = CWFAConfig(
        n_depths=nd, volume_side_size=vs, n_lenslets=nl,
        INN_max_down_steps=3, INN_n_blocks=2, INN_internal_chans=16,
        INN_cond_chans=8, epochs=epochs, eval_every=10 ** 9,
        save_tiff_volumes=0, lenslet_file=info["lenslet_file"]).decode_lrs()
    model = CWFAModel.build(cfg)
    vidx = make_view_indices(ds.lenslet_coords, (img, img), (vs, vs))
    trainer = CWFATrainer(model, cat.get_statistics(), vidx)
    print(f"[2] training synthetic config for {epochs} epochs...", flush=True)
    t0 = time.time()
    for ep in range(epochs):
        loss = trainer.train_epoch(cat, ep)
        if ep % 8 == 0:
            print(f"  epoch {ep}: loss {loss:.4f} ({time.time()-t0:.0f}s)",
                  flush=True)
    print(f"  final loss {loss:.4f}", flush=True)
    trainer.ensure_mean_caches(cat)

    frames = np.stack([ds.stacked_views[i] for i in range(6)])
    gts = np.stack([ds.vols[i] for i in range(6)])
    mk = lambda **kw: XLFMReconstructor(
        trainer.model, trainer.params, trainer.mstate, trainer.stats, vidx,
        trainer.mean_caches[0], deterministic=True,
        compute_dtype=jnp.bfloat16, **kw)
    ref_path = mk(use_int8=False, pair_input_towers=False)
    fast = mk(use_int8=True, calib_frames=frames, pair_input_towers="mid")
    v_ref = np.asarray(ref_path(frames))
    v_fast = np.asarray(fast(frames))
    peak = float(np.abs(gts).max())
    p_ref = psnr(v_ref, gts, peak)
    p_fast = psnr(v_fast, gts, peak)
    agree = psnr(v_fast, v_ref)
    print(f"[2] TRAINED synthetic model: PSNR vs GT — bf16 path "
          f"{p_ref:.2f} dB, shipped fast path {p_fast:.2f} dB "
          f"(delta {p_fast - p_ref:+.2f} dB); pipeline agreement "
          f"{agree:.2f} dB", flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    epochs = int(args[0]) if args else 48
    # --part 1|2 runs one half (each flagship compile is minutes; CI-style
    # wrappers with per-command time budgets run the parts separately)
    if "--part" in sys.argv:
        part = sys.argv[sys.argv.index("--part") + 1]
    else:
        part = "all"
    if part in ("1", "all"):
        flagship_agreement()
    if part in ("2", "all"):
        trained_quality(epochs)


if __name__ == "__main__":
    main()
