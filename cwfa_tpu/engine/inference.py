"""Batched inference pipeline — the production 3D-reconstruction path.

The reference reconstructs one frame at a time inside its eval loop
(CWFA.py:865-927, ~0.16 s/frame on GPU).  Here the whole chain — lenslet view
extraction, normalization, LRNN, four inverse CWF steps, un-normalization —
is ONE jitted XLA program, batched over frames, optionally sharded over a
device mesh (batch on the 'data' axis, image rows on the 'space' axis; XLA
inserts halo exchanges for the convs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.data.views import extract_views
from cwfa_tpu.models.cwfa_model import CWFAModel


class XLFMReconstructor:
    """Callable: raw camera frames (B, H, W) -> volumes (B, D, S, S)."""

    def __init__(self, model: CWFAModel, params, mstate,
                 stats: DatasetStatistics, view_indices, mean_caches,
                 mesh=None, deterministic: bool = False,
                 compute_dtype=jnp.float32, use_pallas: bool = False,
                 use_int8: bool = False, calib_frames=None,
                 pair_input_towers="mid",
                 use_int8_towers: bool = False,
                 use_int8_cond: bool = False):
        self.model = model
        self.stats = stats
        self.deterministic = deterministic
        cfg = model.cfg

        mean_i, std_i = stats.mean_imgs, stats.std_imgs
        mean_v, std_v = stats.mean_vols, stats.std_vols

        def _norm_views(raw_images):
            views = extract_views(raw_images, view_indices)
            return ((views - mean_i) / std_i).astype(compute_dtype)

        # int8 inference packs, calibrated per-channel on real frames and
        # folded into int8 weights once at build time:
        # - use_int8: the LRNN UNet (models/unet — deep-N GEMMs where the
        #   MXU int8 2x rate engages; the measured round-2 win);
        # - use_int8_towers: the flow coupling towers through the fused
        #   Pallas kernel (ops/qtower — measured to only tie bf16 on v5e at
        #   these N=128 shapes; kept as an option for other hardware).
        self._qpacks = None
        self._unet_q = None
        self._cond_q = None
        if use_int8 or use_int8_towers or use_int8_cond:
            if calib_frames is None:
                raise ValueError("int8 paths require calib_frames "
                                 "(a batch of raw camera frames)")
            if use_int8 and not deterministic:
                # lrnn() routes to the int8 UNet only when not train; with
                # deterministic=False reconstruct passes lrnn_train=True
                # and the pack would be calibrated, paid for, and silently
                # unused (it folds eval-mode BatchNorm stats — there is no
                # train-mode int8 form)
                raise ValueError("use_int8 requires deterministic=True "
                                 "(the int8 UNet folds eval-mode BN stats)")
            calib_views = jax.jit(_norm_views)(jnp.asarray(calib_frames))
            if use_int8:
                self._unet_q = jax.tree_util.tree_map(
                    jnp.asarray,
                    model.quantize_unet_pack(params, mstate, calib_views))
            if use_int8_cond and cfg.force_all_steps_NF:
                # the views conditions are zeroed under force_all_steps_NF
                # (CWFA.py:892-894): the cond nets never run, so the pack
                # would be calibrated, paid for, and silently unused
                print("warning: use_int8_cond has no effect with "
                      "force_all_steps_NF=1 (cond nets are bypassed); "
                      "skipping calibration", flush=True)
            if use_int8_cond and not cfg.force_all_steps_NF:
                # int8 y-intermediate for the cond nets' 3-D pairs.
                # Measured NEUTRAL at batch 16 (49.22 vs 49.08 ms/frame,
                # round 3): the requant ops + int32 conv_b output offset the
                # halved y bytes.  Kept off by default; tolerance-guarded in
                # tests/test_cond_net.py.
                from cwfa_tpu.models.cond_net import quantize_cond_networks
                self._cond_q = jax.jit(quantize_cond_networks)(
                    params["cond"], calib_views[:2])
            if use_int8_towers:
                self._qpacks = jax.tree_util.tree_map(
                    jnp.asarray, model.quantize_steps(params, calib_views))

        def recon(params, mstate, raw_images, mean_caches, mean_branch,
                  qpacks, unet_q, cond_q, key):
            views_n = _norm_views(raw_images)
            b = raw_images.shape[0]
            mcs = [jnp.broadcast_to(c.astype(compute_dtype),
                                    (b,) + c.shape[1:]) for c in mean_caches]
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                views_n = jax.lax.with_sharding_constraint(
                    views_n, NamedSharding(mesh, P("data", None, "space", None)))
            vol = model.reconstruct(
                params, mstate, views_n, mcs,
                z_temperature=cfg.INN_z_temperature,
                rng=None if deterministic else key,
                train=False, lrnn_train=not deterministic,
                n_samples=cfg.INN_n_samples, fast=use_pallas,
                lrnn_mean_branch=mean_branch, qpacks=qpacks,
                pair_input_towers=pair_input_towers, unet_q=unet_q,
                cond_q=cond_q)
            return vol.astype(jnp.float32) * std_v + mean_v

        from cwfa_tpu.utils.compile_opts import compiler_options
        self._fn = jax.jit(recon, compiler_options=compiler_options())
        self._params = params
        self._mstate = mstate
        self._mean_caches = [jnp.asarray(c) for c in mean_caches]
        # The LRNN's ConvNeXt mean-volume correction is a pure function of
        # the per-dataset mean cache — constant across frames — so the
        # deterministic pipeline computes it once instead of running two
        # ConvNeXt blocks + attention gate per frame (networks.py:551-555
        # applied to a frame-independent input).
        self._mean_branch = None
        if deterministic and not model.cfg.force_last_step_NF:
            from cwfa_tpu.models.lrnn import lrnn_mean_branch
            nf = model.n_flow_steps

            @jax.jit
            def _branch(params, mc):
                return lrnn_mean_branch(model.lrnn_spec, params["lrnn"],
                                        mc.astype(compute_dtype))
            self._mean_branch = _branch(params, self._mean_caches[nf - 1])
        self._key = jax.random.PRNGKey(cfg.seed)

    def __call__(self, raw_images) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return self._fn(self._params, self._mstate, jnp.asarray(raw_images),
                        self._mean_caches, self._mean_branch, self._qpacks,
                        self._unet_q, self._cond_q, sub)

    def warmup(self, batch_size: int, img_hw):
        dummy = jnp.zeros((batch_size,) + tuple(img_hw), jnp.float32)
        # tiny-slice fetch, not block_until_ready: the latter is not a
        # reliable execution barrier through the remote tunnel (CLAUDE.md)
        # — a warmup that returns early would queue the first real batch
        # behind the still-running warmup execution
        np.asarray(self(dummy)[0, 0, 0, :4])

    def throughput(self, raw_images, n_repeats: int = 10):
        """frames/sec measured by enqueueing n_repeats executions and
        fetching a tiny slice of the LAST output: the device serializes the
        executions, so total time = n * t_exec + one host round trip — the
        round trip amortizes away (block_until_ready alone is not a reliable
        barrier on remote-execution platforms and a per-call fetch pays the
        full RPC latency each iteration). The reference uses CUDA events
        (CWFA.py:683,876,921-924)."""
        import time

        def barrier(out):
            return np.asarray(out[0, 0, 0, :4])

        barrier(self(raw_images))               # warmup + sync
        t0 = time.perf_counter()
        out = None
        for _ in range(n_repeats):
            out = self(raw_images)
        barrier(out)
        total = time.perf_counter() - t0
        frames = raw_images.shape[0] * n_repeats
        # ONE amortized figure: the enqueue-N/fetch-last design cannot
        # observe per-repeat times, so no min/best statistic exists
        return frames / total

    def latency_ms(self, raw_image, n: int = 20):
        """Single-frame end-to-end latency (the reference's headline is a
        LATENCY: ~0.16 s/frame, README.md:29): one batch-1 execution per
        measurement, each closed by a tiny output fetch (block_until_ready
        is not a reliable barrier through the remote tunnel).  Returns
        (p50_ms, min_ms) over n calls.  The per-call fetch rides the
        tunnel RPC, so this UPPER-bounds device latency; amortized batch-1
        throughput (``throughput``) bounds it from below."""
        import time

        assert raw_image.shape[0] == 1, raw_image.shape
        times = []
        np.asarray(self(raw_image)[0, 0, 0, :4])      # warm
        for _ in range(n):
            t0 = time.perf_counter()
            np.asarray(self(raw_image)[0, 0, 0, :4])
            times.append((time.perf_counter() - t0) * 1e3)
        return float(np.percentile(times, 50)), float(np.min(times))
