"""Full CWFA model: LRNN + chain of CWF flow steps + condition networks.

Static container of specs whose methods are pure functions of (params, state,
inputs) — the whole forward-NLL pyramid and the whole inverse reconstruction
chain each trace into a single XLA program.

Structure for the default config (n_depths=96, 5 pyramid steps):
  flow steps k=0..3 on volumes of 96/2^k depth-channels (specs/params lists),
  cond nets k=0..3 mapping 29 views -> 96/2^{k+1} channels,
  LRNN producing the coarsest 6-depth volume from views + mean-volume prior.

Reference mapping: run_CWFA network construction (CWFA.py:472-526),
evaluate_INN_forward (CWFA.py:134-196), reverse reconstruction loop
(CWFA.py:865-927).
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from cwfa_tpu import nn as cnn
from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.models.cond_net import init_cond_network, cond_network
from cwfa_tpu.models.cwf import (
    CWFStepSpec, build_step_specs, init_cwf_step, cwf_step_forward,
    cwf_step_reverse, quantize_cat_step)
from cwfa_tpu.models.lrnn import LRNNSpec, init_lrnn, lrnn


def sample_z_truncated(key, shape, temperature: float, dtype=jnp.float32):
    """z sampling (reference CWFA.py:47-64): zeros at temperature 0, else a
    std-1 normal truncated to [-T, T] (utils.py:42-82)."""
    if temperature == 0:
        return jnp.zeros(shape, dtype)
    return jax.random.truncated_normal(
        key, -temperature, temperature, shape, dtype)


def sample_z_rev_like(key, x, temperature: float = 0.0,
                      same_size: bool = False):
    """Reverse-direction z sampling helper (reference CWFA.py:66-82):
    zeros at temperature 0, else gaussian scaled by temperature; shape is
    x's shape (same_size) or the (B, 3*W, H, W) layout variant."""
    if isinstance(x, (tuple, list)):
        shape = tuple(x)
    elif same_size:
        shape = x.shape
    else:
        shape = (x.shape[0], 3 * x.shape[-1], x.shape[2], x.shape[3])
    if temperature == 0:
        return jnp.zeros(shape, jnp.float32)
    return jax.random.normal(key, shape) * temperature


def check_empty_depths(key, vol):
    """Add sigma=1e-3 noise to all-constant depth slices (CWFA.py:84-96),
    protecting ActNorm/std==0 paths."""
    empty = jnp.std(vol, axis=(2, 3), keepdims=True) == 0
    noise = 0.001 * jax.random.normal(key, vol.shape, vol.dtype)
    return jnp.where(empty, vol + noise, vol)


@dataclass(frozen=True)
class CWFAModel:
    cfg: CWFAConfig
    step_specs: tuple          # CWFStepSpec for k = 0..n_flow-1
    lrnn_spec: LRNNSpec

    # ---------------------------------------------------------------- build
    @classmethod
    def build(cls, cfg: CWFAConfig) -> "CWFAModel":
        # force_last_step_NF (reference CWFA.py:489-510,781,880): the coarsest
        # pyramid level is produced by a flow step instead of the LRNN, so one
        # extra CWF step is built and the reconstruction range extends through
        # it. (The reference's own construction path for this flag is
        # unrunnable — conv_inn_temp[ix] indexes a stale 4-long list at ix=4 —
        # so this implements the documented intent; see docs/PARITY.md.)
        n_flow = cfg.INN_max_down_steps - 1 + (1 if cfg.force_last_step_NF
                                               else 0)
        specs = build_step_specs(
            n_depths=cfg.n_depths, spatial=cfg.volume_side_size,
            n_flow_steps=n_flow, n_blocks=cfg.INN_n_blocks,
            block_type=cfg.INN_block_type, internal_ch=cfg.INN_internal_chans,
            use_bias=bool(cfg.INN_use_bias),
            use_final_perm=cfg.INN_use_perm == 1,
            disable_low_res_input=bool(cfg.disable_low_res_input),
            global_seed=cfg.seed)
        # The LRNN always targets the 2^(max_down_steps-1) level (the
        # reference keeps the Encoder as cond_nets[-1] even when the last
        # step is forced to a flow, CWFA.py:493-495).
        lrnn_spec = LRNNSpec(
            ch_in=cfg.n_lenslets,
            n_depths=cfg.n_depths // (2 ** (cfg.INN_max_down_steps - 1)),
            spatial=cfg.volume_side_size, use_bias=bool(cfg.INN_use_bias))
        return cls(cfg=cfg, step_specs=tuple(specs), lrnn_spec=lrnn_spec)

    @property
    def n_flow_steps(self) -> int:
        return len(self.step_specs)

    def init(self, key):
        ks = cnn.key_iter(key)
        flow = [init_cwf_step(next(ks), s) for s in self.step_specs]
        cond = [init_cond_network(next(ks), self.cfg.n_lenslets,
                                  self.cfg.n_depths // (2 ** (k + 1)),
                                  chans_3d=self.cfg.INN_cond_chans)
                for k in range(self.n_flow_steps)]
        lrnn_params, lrnn_state = init_lrnn(next(ks), self.lrnn_spec)
        params = {"flow": flow, "cond": cond, "lrnn": lrnn_params}
        state = {"lrnn": lrnn_state}
        return params, state

    # ------------------------------------------------------------- forward
    def forward_pyramid(self, params, gt_volume, mean_caches=None,
                        per_sample: bool = False):
        """evaluate_INN_forward (CWFA.py:134-196): run all flow steps in the
        normalizing direction with ZERO conditions (the reference's forward
        pyramid is unconditional in effect, CWFA.py:167-177; extra_cond_in is
        the mean cache when provided).

        Returns (nll_per_step, gt_cache, prior_errors, log_jacobians) where
        gt_cache[k] is the pyramid volume at level k (gt_cache[0] = input).

        per_sample=True returns (B,)-shaped per-frame NLLs (the quantities
        the batched eval/OOD paths threshold); the reference runs batch 1
        where the two are identical — (0.5*||Z_i||^2 - logdet_i) /
        (numel(Z[-1]) / B) reduces to the CWFA.py:189-192 expression.
        """
        b = gt_volume.shape[0]
        hw = gt_volume.shape[2:]
        gt_cache = [gt_volume]
        nlls, priors, logjacs = [], [], []
        v = gt_volume
        for k, spec in enumerate(self.step_specs):
            cshape = (b, spec.c_flow) + hw
            c_views = jnp.zeros(cshape, v.dtype)
            if mean_caches is not None:
                c_mean = mean_caches[k]
            else:
                c_mean = jnp.zeros(cshape, v.dtype)
            z, avg, logdet = cwf_step_forward(spec, params["flow"][k], v,
                                              c_views, c_mean)
            zf = z.astype(jnp.float32)
            numel = float(avg.size)
            if per_sample:
                prior_b = 0.5 * jnp.sum(zf ** 2,
                                        axis=tuple(range(1, zf.ndim)))
                nlls.append((prior_b - logdet) / (numel / b))
                priors.append(prior_b / (numel / b))
                logjacs.append(logdet / (numel / b))
            else:
                prior = 0.5 * jnp.sum(zf ** 2)
                # reference CWFA.py:189-192: (0.5*||Z||^2 - logdet)/numel,
                # then .mean() over the batch-shaped logdet
                nlls.append(jnp.mean((prior - logdet) / numel))
                priors.append(prior / numel)
                logjacs.append(jnp.mean(logdet) / numel)
            v = avg
            gt_cache.append(v)
        return nlls, gt_cache, priors, logjacs

    def nll_from_pyramid(self, params, gt_cache):
        """Per-sample NLLs recomputed from an existing wavelet pyramid.

        Equivalent to the nlls of ``forward_pyramid`` given the SAME input
        (the pyramid levels are parameter-independent Haar averages, so
        ``gt_cache[k]`` IS the volume forward_pyramid feeds step k,
        CWFA.py:194-195) — but takes the cached levels as inputs instead of
        re-deriving them from the raw volume.  This is the NLL-refresh path
        the trainer uses after parameter updates: it removes the per-epoch
        host->device volume re-upload (the cached levels already live on
        device).  Returns a list of (B,) arrays, one per flow step.
        """
        b = gt_cache[0].shape[0]
        nlls = []
        for k, spec in enumerate(self.step_specs):
            v = gt_cache[k]
            cshape = (b, spec.c_flow) + v.shape[2:]
            zeros = jnp.zeros(cshape, v.dtype)
            z, avg, logdet = cwf_step_forward(spec, params["flow"][k], v,
                                              zeros, zeros)
            zf = z.astype(jnp.float32)
            prior_b = 0.5 * jnp.sum(zf ** 2, axis=tuple(range(1, zf.ndim)))
            nlls.append((prior_b - logdet) / (float(avg.size) / b))
        return nlls

    def step_nll(self, params, k, gt_level, c_views, c_mean):
        """Conditioned NLL of one flow step for training (CWFA.py:966-978):
        re-encode the GT level with the real conditions."""
        spec = self.step_specs[k]
        z, avg, logdet = cwf_step_forward(spec, params["flow"][k], gt_level,
                                          c_views, c_mean)
        zf = z.astype(jnp.float32)
        prior = 0.5 * jnp.sum(zf ** 2)
        # reference CWFA.py:978: (0.5*||Z||^2 - logdet)/numel of the
        # upsampled (= full gt_level) volume.  The reference runs batch 1;
        # batched, the per-sample logdets (shape (B,)) must be SUMMED like
        # the prior so the loss is the batch MEAN of the reference's
        # per-sample NLL — a mean here underweights the jacobian term by B.
        return (prior - jnp.sum(logdet)) / float(gt_level.size), (z, avg)

    # ------------------------------------------------------------- reverse
    def run_cond_net(self, params, k, cond_input, *, train=False, rng=None):
        return cond_network(params["cond"][k], cond_input, train=train, rng=rng)

    def run_lrnn(self, params, state, cond_input, mean_vol, *, train=False,
                 rng=None, mean_branch=None, unet_q=None):
        return lrnn(self.lrnn_spec, params["lrnn"], state["lrnn"], cond_input,
                    mean_vol, train=train, rng=rng, mean_branch=mean_branch,
                    unet_q=unet_q)

    def quantize_unet_pack(self, params, state, cond_input):
        """int8 pack for the LRNN UNet (models/unet), calibrated on a batch
        of normalized views. Returns {"qpack", "scales"} for
        ``reconstruct(unet_q=...)``."""
        from cwfa_tpu.models.unet import quantize_unet, unet_calibrate

        @jax.jit
        def _calib(params, state, cond_input):
            y = cnn.conv2d(params["lrnn"]["proj"], cond_input)
            return unet_calibrate(self.lrnn_spec.unet, params["lrnn"]["unet"],
                                  state["lrnn"]["unet"], y)
        scales = _calib(params, state, cond_input)
        qpack = jax.jit(quantize_unet, static_argnums=0)(
            self.lrnn_spec.unet, params["lrnn"]["unet"], scales)
        return {"qpack": qpack, "scales": scales}

    def reconstruct(self, params, state, cond_input, mean_caches, *,
                    z_temperature: float = 0.0, rng=None, train: bool = False,
                    lrnn_train: bool | None = None,
                    n_samples: int = 1, return_pyramid: bool = False,
                    fast: bool = False, lrnn_mean_branch=None, qpacks=None,
                    pair_input_towers="mid", unet_q=None, cond_q=None):
        """Full generative chain (CWFA.py:865-927): LRNN at the coarsest
        level, then invert flow steps k = n-1..0, doubling depth each time.

        cond_input: normalized views (B, n_lenslets, H, W).
        mean_caches: per-level mean-volume difference caches, index k used as
          the flow condition at step k; entry [n_flow-1] feeds the LRNN
          (reference mean_vols_cache[n_net-1] at CWFA.py:882).
        qpacks: optional per-step int8 tower packs (``quantize_steps``) —
          inference-only quantized coupling towers.
        """
        rngs = cnn.key_iter(rng) if rng is not None else None
        nxt = (lambda: next(rngs)) if rngs is not None else (lambda: None)
        nf = self.n_flow_steps
        b = cond_input.shape[0]
        # mean caches are naturally batch-1 (one per fish); broadcast ONCE
        # here so every downstream path (input block concat, cond stack,
        # LRNN mean branch) sees batch-matched conditions — previously only
        # the n_samples>1 branch broadcast, and batch>1 single-sample
        # reconstruction crashed in the input-block concatenate
        mean_caches = [c if c.shape[0] == b
                       else jnp.broadcast_to(c, (b,) + c.shape[1:])
                       for c in mean_caches]
        force_all_nf = bool(self.cfg.force_all_steps_NF)
        if self.cfg.force_last_step_NF:
            # Last stage is a flow (CWFA.py:781 extends steps_to_reconstruct
            # through the coarsest level): the chain starts from the prior
            # mean of the coarsest averages instead of the LRNN output.
            last = self.step_specs[nf - 1]
            up = jnp.zeros((b, last.c_flow, last.spatial, last.spatial),
                           cond_input.dtype)
        else:
            # the reference keeps the LRNN in train mode even during
            # evaluation ("important due to the dropout/batchnorm",
            # CWFA.py:531-532)
            if lrnn_train is None:
                lrnn_train = train or rng is not None
            up, _ = self.run_lrnn(params, state, cond_input,
                                  mean_caches[nf - 1],
                                  train=lrnn_train, rng=nxt(),
                                  mean_branch=lrnn_mean_branch,
                                  unet_q=unet_q)
        pyramid = {nf: up}
        c_views_all = None
        if not train and not force_all_nf:
            # all cond nets share the input views: run them as one set of
            # wide convs (models/cond_net.cond_networks_batched)
            from cwfa_tpu.models.cond_net import cond_networks_batched
            c_views_all = cond_networks_batched(params["cond"], cond_input,
                                                cond_q=cond_q)
        # Pair the per-step 64-wide input-block towers across steps (exact;
        # a 64-wide conv costs a full MXU tile anyway). Eval-only: training
        # differentiates through _input_block per step.
        input_s = None
        if (c_views_all is not None and pair_input_towers
                and all(s.block_type == "CAT"
                        and not s.disable_low_res_input
                        for s in self.step_specs)):
            from cwfa_tpu.models.cwf import input_tower_s_raw
            input_s = input_tower_s_raw(self.step_specs, params["flow"],
                                        c_views_all,
                                        pair=(False if pair_input_towers == "hoist"
                                              else pair_input_towers))
        for k in range(nf - 1, -1, -1):
            spec = self.step_specs[k]
            if force_all_nf:
                # force_all_steps_NF (CWFA.py:892-894): the processed-views
                # condition is replaced by zeros — a pure NF conditioned only
                # on the mean-volume cache.
                c_views = jnp.zeros(
                    (b, spec.c_flow, spec.spatial, spec.spatial),
                    cond_input.dtype)
            elif c_views_all is not None:
                c_views = c_views_all[k]
            else:
                c_views = self.run_cond_net(params, k, cond_input,
                                            train=train, rng=nxt())
            c_mean = mean_caches[k]
            zshape = (b * n_samples, spec.c_flow, spec.spatial, spec.spatial)
            if z_temperature == 0:
                z = jnp.zeros(zshape, up.dtype)
            else:
                z = sample_z_truncated(nxt(), zshape, z_temperature, up.dtype)
            qp = None if qpacks is None else qpacks[k]
            isr = None if input_s is None else input_s[k]
            if n_samples > 1:
                up_in = jnp.tile(up, (n_samples, 1, 1, 1))
                cv = jnp.tile(c_views, (n_samples, 1, 1, 1))
                # c_mean is already batch-b (broadcast at entry)
                cm = jnp.tile(c_mean, (n_samples, 1, 1, 1))
                if isr is not None:
                    isr = jnp.tile(isr, (n_samples, 1, 1, 1))
                v, _ = cwf_step_reverse(spec, params["flow"][k], z, up_in,
                                        cv, cm, fast=fast, qpack=qp,
                                        input_s_raw=isr)
                v = v.reshape((n_samples, b) + v.shape[1:]).mean(0)
            else:
                v, _ = cwf_step_reverse(spec, params["flow"][k], z, up,
                                        c_views, c_mean, fast=fast,
                                        qpack=qp, input_s_raw=isr)
            up = v
            pyramid[k] = up
        if return_pyramid:
            return up, pyramid
        return up

    # --------------------------------------------------------------- misc
    def make_mean_caches(self, params, mean_volume, key=None):
        """Mean-volume conditioning pyramid (CWFA.py:625-655): run the forward
        pyramid on the (normalized) mean volume and store each level as
        depth-pair differences gt[:, ::2] - gt[:, 1::2] (CWFA.py:655)."""
        v = mean_volume
        if key is not None:
            v = v + 0.001 * jax.random.normal(key, v.shape, v.dtype)
        _, gt_cache, _, _ = self.forward_pyramid(params, v)
        return [g[:, ::2] - g[:, 1::2] for g in gt_cache]

    def quantize_steps(self, params, cond_input, max_calib_frames: int = 2):
        """Build int8 inference packs for every CAT step's paired coupling
        towers, calibrated on a batch of normalized views (models/cwf.
        quantize_cat_step).  Returns a list indexed by step k (None entries
        for steps the quantized kernel does not cover).

        Calibration is jitted (the f32 tower trace at flagship scale holds
        ~1 GB per activation site — eager evaluation would keep all eight
        alive) and capped at max_calib_frames frames; per-channel absmax
        saturates quickly."""
        from cwfa_tpu.models.cond_net import cond_networks_batched
        cond_input = cond_input[:max_calib_frames]
        c_views_all = jax.jit(cond_networks_batched)(params["cond"],
                                                     cond_input)
        packs = []
        for k, spec in enumerate(self.step_specs):
            if spec.block_type == "CAT" and spec.n_blocks >= 2 \
                    and not self.cfg.force_all_steps_NF:
                packs.append(jax.jit(quantize_cat_step,
                                     static_argnums=0)(
                    spec, params["flow"][k], c_views_all[k]))
            else:
                packs.append(None)
        return packs

    def param_counts(self, params):
        """Printed at startup by the reference (CWFA.py:569-584)."""
        cnt = lambda p: sum(x.size for x in jax.tree_util.tree_leaves(p))
        return {"WF": cnt(params["flow"]), "Omega": cnt(params["cond"]),
                "LRNN": cnt(params["lrnn"])}
