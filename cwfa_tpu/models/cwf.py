"""Conditional Wavelet Flow steps as statically composed invertible functions.

Replaces the reference's per-step FrEIA ``GraphINN`` graphs
(networks.py:264-368 ``conditional_wavelet_flow`` + the graph interpreter in
FrEIA/framework/graph_inn.py:242-326) with fixed function composition that
jit-compiles into a single XLA program.

Per-step graph (reference networks.py:305-366), for step k on a volume with
D = n_depths/2^k depth-channels:

  fwd:  v --Haar1D--> [avg | diff] --Split-->  avg  (to next step)
        diff --CAT_first(c_mean, c_views)--> x0
        for nn = 1..n_blocks:
            x --Permute(nn)--> --Coupling(c_views)--> x
        [--PermuteRandom--]  (if INN_use_perm)
        outputs (z, avg), logdet

  rev   inverts the chain; ``avg`` is the upsampled volume from the coarser
        step, z is sampled (zeros at temperature 0, CWFA.py:47-64).

Condition wiring (verified against the reference graph construction):
- GraphINN's condition list order is [Condition I, Condition] (append order at
  networks.py:333-335); run_CWFA passes c = [cond_net(views), mean_cache]
  (CWFA.py:893-899), so "Condition I" carries the processed views and
  "Condition" the mean-volume cache.
- The input ConditionalAffineTransform receives conditions=[Condition,
  Condition I] (networks.py:336-339), concatenated as [mean_cache | views]
  — its ``_first`` subnet splits them back into (low_res_up_grad, cond)
  (networks.py:656-671).
- The n_blocks coupling blocks condition on cond[-1] = Condition I = views
  (networks.py:347-350).
- With --disable_low_res_input there is a single condition; at reverse time
  run_CWFA feeds the upsampled volume itself as that condition
  (CWFA.py:897-901).
"""

from __future__ import annotations

from dataclasses import dataclass, field
import jax
import jax.numpy as jnp
import numpy as np

from cwfa_tpu import nn as cnn
from cwfa_tpu.flow import coupling as fc
from cwfa_tpu.flow import subnets as fs
from cwfa_tpu.flow.haar import haar1d_split, haar1d_merge
from cwfa_tpu.flow.permute import (
    ReferencePermReplayer, apply_channel_perm, apply_spatial_perm)


@dataclass(frozen=True)
class CWFStepSpec:
    """Static description of one CWF pyramid step (flow on the differences)."""
    step: int                       # k = 0..n_steps-2
    d_in: int                       # depth-channels of the input volume
    spatial: int                    # H = W
    n_blocks: int = 4
    block_type: str = "CAT"         # CAT | RNVP | GLOW | GIN | NICE | AI1
    internal_ch: int = 64
    use_bias: bool = True
    clamp: float = 2.0
    clamp_activation: str = "ATAN"
    use_final_perm: bool = True
    disable_low_res_input: bool = False
    # permutation specs from ReferencePermReplayer; tuples of numpy arrays.
    # Excluded from __eq__/__hash__ directly (arrays are unhashable) but
    # represented by the content fingerprint below, so two specs with
    # different permutations (e.g. before/after reset_permutations) never
    # collide as jit static args.
    perms: tuple = field(default_factory=tuple, hash=False, compare=False)
    perms_fp: int = 0               # derived in __post_init__

    def __post_init__(self):
        fp = hash(tuple(
            tuple(a.tobytes() if isinstance(a, np.ndarray) else a
                  for a in entry)
            for entry in self.perms))
        object.__setattr__(self, "perms_fp", fp)

    @property
    def c_flow(self) -> int:        # differences channel count
        return self.d_in // 2


def build_step_specs(n_depths: int, spatial: int, n_flow_steps: int,
                     n_blocks: int, block_type: str, internal_ch: int,
                     use_bias: bool, use_final_perm: bool,
                     disable_low_res_input: bool, global_seed: int,
                     clamp: float = 2.0, clamp_activation: str = "ATAN"):
    """Build specs for flow steps k = 0..n_flow_steps-1 with reference-parity
    permutations (the replayer walks the numpy RNG exactly like run_CWFA's
    sequence of conditional_wavelet_flow calls, CWFA.py:478-510)."""
    replayer = ReferencePermReplayer(global_seed)
    specs = []
    for k in range(n_flow_steps):
        perms = replayer.build_factory_call(
            n_down_steps=k + 1, n_depths=n_depths, spatial_size=spatial,
            n_blocks=n_blocks, use_final_perm=use_final_perm)
        specs.append(CWFStepSpec(
            step=k, d_in=n_depths // (2 ** k), spatial=spatial,
            n_blocks=n_blocks, block_type=block_type, internal_ch=internal_ch,
            use_bias=use_bias, use_final_perm=use_final_perm,
            disable_low_res_input=disable_low_res_input,
            perms=tuple(perms), clamp=clamp, clamp_activation=clamp_activation))
    return specs


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------


def _init_coupling_block(key, spec: CWFStepSpec):
    """One nn-block coupling of the chosen type, conditioned on c_views
    (n = c_flow channels)."""
    n = spec.c_flow
    cond_len = n
    bt = spec.block_type
    mk = lambda k_, ci, co: fs.init_wavelet_flow_subnet2d(
        k_, ci, co, n_ch=spec.internal_ch, use_bias=spec.use_bias)
    l1, l2 = n // 2, n - n // 2
    ks = cnn.key_iter(key)
    if bt == "CAT":
        return {"subnet": mk(next(ks), cond_len, 2 * n)}
    if bt == "RNVP":
        return {"s1": mk(next(ks), l1 + cond_len, l2),
                "t1": mk(next(ks), l1 + cond_len, l2),
                "s2": mk(next(ks), l2 + cond_len, l1),
                "t2": mk(next(ks), l2 + cond_len, l1)}
    if bt in ("GLOW", "GIN"):
        return {"subnet1": mk(next(ks), l1 + cond_len, 2 * l2),
                "subnet2": mk(next(ks), l2 + cond_len, 2 * l1)}
    if bt == "NICE":
        return {"F": mk(next(ks), l2 + cond_len, l1),
                "G": mk(next(ks), l1 + cond_len, l2)}
    if bt == "AI1":
        sl1 = n - n // 2
        return {"aio": fc.init_all_in_one_block(next(ks), n),
                "subnet": mk(next(ks), sl1 + cond_len, 2 * (n // 2))}
    raise ValueError(f"unknown block type {bt!r}")


def init_cwf_step(key, spec: CWFStepSpec):
    """Parameters: input CAT block + n_blocks couplings."""
    ks = cnn.key_iter(key)
    n = spec.c_flow
    if spec.disable_low_res_input:
        inp = {"subnet": fs.init_wavelet_flow_subnet2d(
            next(ks), n, 2 * n, n_ch=spec.internal_ch, use_bias=spec.use_bias)}
    else:
        inp = {"subnet": fs.init_wavelet_flow_subnet2d_first(
            next(ks), 2 * n, 2 * n, n_ch=spec.internal_ch,
            use_bias=spec.use_bias)}
    blocks = [_init_coupling_block(next(ks), spec)
              for _ in range(spec.n_blocks)]
    return {"input_block": inp, "blocks": blocks}


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------


def _apply_perm(spec_entry, x, inverse: bool):
    if spec_entry[0] == "channel":
        _, perm, inv = spec_entry
        return apply_channel_perm(x, inv if inverse else perm)
    _, axis, perm, inv = spec_entry
    return apply_spatial_perm(x, axis, inv if inverse else perm)


# ---------------------------------------------------------------------------
# Fast CAT path: paired subnet towers
#
# ConditionalAffineTransform predicts (s, t) from the CONDITION only
# (coupling_layers.py:475-500), so every coupling block's subnet takes the
# same input (the processed views) and they are mutually independent.  On
# TPU a 64-wide conv wastes half an MXU tile (a 64->64 3x3 conv measures the
# same latency as 64->128), so consecutive blocks' towers are fused into
# block-diagonal 128-wide convs — identical numerics, ~1.5x on the dominant
# convs.  The affine/permute chain then runs as cheap elementwise ops.
# ---------------------------------------------------------------------------


def _bd(wa, wb):
    """Block-diagonal concat of two OIHW kernels (the shared builder lives
    with the other pairing machinery in models/cond_net)."""
    from cwfa_tpu.models.cond_net import _block_diag_w
    return _block_diag_w([wa, wb])


def _pair_conv(pa, pb, shared_input: bool):
    out = {"w": jnp.concatenate([pa["w"], pb["w"]], 0) if shared_input
           else _bd(pa["w"], pb["w"])}
    if "b" in pa:
        out["b"] = jnp.concatenate([pa["b"], pb["b"]], 0)
    return out


def pair_tower_params(pa, pb, shared_input: bool = True):
    """Block-diagonally pair two towers' params into one 2x-wide tower.

    shared_input=True stacks b1 on a common input (coupling towers of the
    same step); False block-diagonalizes b1 too (input = channel concat of
    two different conditions — the cross-step input-tower pairing)."""
    return {
        "b1": _pair_conv(pa["b1"], pb["b1"], shared_input=shared_input),
        "b2a": _pair_conv(pa["b2a"], pb["b2a"], shared_input=False),
        "b2b": _pair_conv(pa["b2b"], pb["b2b"], shared_input=False),
        "b4a": _pair_conv(pa["b4a"], pb["b4a"], shared_input=False),
        "b4b": _pair_conv(pa["b4b"], pb["b4b"], shared_input=False),
        "b6a": _pair_conv(pa["b6a"], pb["b6a"], shared_input=False),
        "b6b": _pair_conv(pa["b6b"], pb["b6b"], shared_input=False),
        "b7": _pair_conv(pa["b7"], pb["b7"], shared_input=False),
    }


def _paired_tower(pa, pb, cond):
    """Run two wavelet-flow subnets on the same input as one 2x-wide tower."""
    out = fs.wavelet_flow_subnet2d(pair_tower_params(pa, pb), cond)
    half = out.shape[1] // 2
    return out[:, :half], out[:, half:]


def paired_tower_concat(pa, pb, cond_a, cond_b):
    """Two towers with DIFFERENT inputs as one block-diagonal 2x-wide tower
    (used to pair the per-step input-block towers ACROSS steps: every step
    runs at the same 512x512 spatial size, and a 64-wide conv costs the
    same as a 128-wide one on the MXU — see docs/PERFORMANCE.md)."""
    out = fs.wavelet_flow_subnet2d(
        pair_tower_params(pa, pb, shared_input=False),
        jnp.concatenate([cond_a, cond_b], axis=1))
    na = pa["b7"]["w"].shape[0]
    return out[:, :na], out[:, na:]


def input_tower_s_raw(step_specs, flow_params, c_views_list, pair=True):
    """Pre-clamp s of every CAT step's input ConditionalAffineTransform.

    The input-block subnet (wavelet_flow_subnet2d_first) computes
    s_raw = tower(c_views) and t = -c_mean/sqrt(2) (flow/subnets.py:82-89,
    reference networks.py:656-671); s_raw only depends on the views
    condition, so all steps' input towers can run before the reverse chain,
    paired across consecutive steps into 128-wide towers.  Only valid for
    CAT steps without disable_low_res_input."""
    nf = len(step_specs)
    outs = [None] * nf
    i = 0
    while i < nf:
        # True: pair greedily from step 0.  "tail": only the last two
        # steps (the small towers — pairing the big step-0/1 towers
        # regresses the full pipeline, docs/PERFORMANCE.md); needs nf >= 3,
        # else "tail" would pair exactly the big towers it exists to avoid.
        # "mid": steps 1+2, leaving 0 and nf-1 single.
        do_pair = (pair is True and i + 1 < nf) or \
                  (pair == "tail" and i + 1 == nf - 1 and nf >= 3) or \
                  (pair == "mid" and i == 1 and i + 1 < nf)
        if do_pair:
            oa, ob = paired_tower_concat(
                flow_params[i]["input_block"]["subnet"],
                flow_params[i + 1]["input_block"]["subnet"],
                c_views_list[i], c_views_list[i + 1])
            outs[i], outs[i + 1] = oa, ob
            i += 2
        else:
            outs[i] = fs.wavelet_flow_subnet2d(
                flow_params[i]["input_block"]["subnet"], c_views_list[i])
            i += 1
    return outs


def quantize_cat_step(spec: CWFStepSpec, params, c_views_sample):
    """Build the int8 inference pack for one CAT step's paired coupling
    towers (ops/qtower): per-channel activation calibration on sample
    conditions, activation scales folded into per-output-channel int8
    weights.  Returns a list of {"qw", "scales"} dicts, one per tower pair
    (odd tail towers and the input block stay on the bf16 XLA path)."""
    from cwfa_tpu.ops import qtower

    packs = []
    i = 0
    while i + 1 < spec.n_blocks:
        paired = pair_tower_params(params["blocks"][i]["subnet"],
                                   params["blocks"][i + 1]["subnet"])
        scales = qtower.pair_tower_calibrate(paired, c_views_sample)
        packs.append({"qw": qtower.quantize_pair_tower(paired, scales),
                      "scales": scales})
        i += 2
    return packs


def _cat_block_st(spec: CWFStepSpec, params, c_views, raw: bool = False,
                  qpack=None):
    """(s, t) for every coupling block, with consecutive blocks paired.
    raw=True returns the pre-clamp s_raw (the Pallas fast path clamps
    in-kernel).  qpack (from ``quantize_cat_step``) routes the paired towers
    through the fused int8 Pallas kernel."""
    n = spec.c_flow
    outs = [None] * spec.n_blocks
    xq = None
    i = 0
    while i < spec.n_blocks:
        if i + 1 < spec.n_blocks:
            if qpack is not None:
                from cwfa_tpu.ops import qtower
                pk = qpack[i // 2]
                if xq is None:
                    # the input scale row depends only on c_views, so one
                    # quantization serves every pair of this step
                    xq = qtower.quantize_input(c_views, pk["scales"][0])
                out = qtower.fused_pair_tower(
                    xq, pk["qw"], pk["scales"],
                    h=c_views.shape[2], w=c_views.shape[3],
                    out_dtype=c_views.dtype,
                    interpret=jax.default_backend() != "tpu")
                out = jnp.transpose(out, (0, 3, 1, 2))
                half = out.shape[1] // 2
                oa, ob = out[:, :half], out[:, half:]
            else:
                oa, ob = _paired_tower(params["blocks"][i]["subnet"],
                                       params["blocks"][i + 1]["subnet"],
                                       c_views)
            outs[i], outs[i + 1] = oa, ob
            i += 2
        else:
            outs[i] = fs.wavelet_flow_subnet2d(params["blocks"][i]["subnet"],
                                               c_views)
            i += 1
    fcl = fc.clamp_fn(spec.clamp_activation)
    st = []
    for a in outs:
        s_raw, t = a[:, :n], a[:, n:]
        if raw:
            st.append((s_raw, t))
        else:
            # clamp in the COMPUTE dtype: at bf16 inference the ATAN runs on
            # half the bytes (the exp consumer re-rounds to bf16 anyway, so
            # reconstruction numerics are unchanged); f32 paths (tests,
            # training parity) still clamp in f32.  logdet consumers
            # accumulate in f32 (_cat_chain).
            st.append(((spec.clamp * fcl(s_raw)).astype(s_raw.dtype), t))
    return st


def _cat_reverse_fast(spec: CWFStepSpec, params, z, avg, c_views, c_mean,
                      qpack=None, input_s_raw=None):
    """Inference-only reverse of a CAT step using the Pallas fused kernels
    (cwfa_tpu.ops.pallas_flow): exp+affine fused per block, and the input
    affine fused with the inverse Haar butterfly. The soft clamp runs in XLA
    (fused into the subnet tail; Pallas TPU lacks an atan lowering).
    No logdet, no grads."""
    from cwfa_tpu.ops.pallas_flow import (cat_affine, clamp_s,
                                          haar_merge_affine)

    n = spec.c_flow
    st = _cat_block_st(spec, params, c_views, raw=True, qpack=qpack)
    x = z
    if spec.use_final_perm:
        x = _apply_perm(spec.perms[spec.n_blocks], x, inverse=True)
    for nn in range(spec.n_blocks, 0, -1):
        s_raw, t = st[nn - 1]
        s = clamp_s(s_raw, spec.clamp, spec.clamp_activation).astype(x.dtype)
        x = cat_affine(x, s, t, rev=True)
        x = _apply_perm(spec.perms[nn - 1], x, inverse=True)
    if input_s_raw is not None and not spec.disable_low_res_input:
        s_in = clamp_s(input_s_raw, spec.clamp,
                       spec.clamp_activation).astype(x.dtype)
        t_in = -c_mean * jnp.asarray(fs._SQRT2_INV, x.dtype)
    else:
        if spec.disable_low_res_input:
            a = fs.wavelet_flow_subnet2d(params["input_block"]["subnet"],
                                         c_views)
        else:
            a = fs.wavelet_flow_subnet2d_first(
                params["input_block"]["subnet"],
                jnp.concatenate([c_mean, c_views], axis=1))
        s_in = clamp_s(a[:, :n], spec.clamp,
                       spec.clamp_activation).astype(x.dtype)
        t_in = a[:, n:]
    v = haar_merge_affine(x, s_in, t_in, avg)
    logdet = jnp.zeros((z.shape[0],), jnp.float32)  # not tracked (inference)
    return v, logdet


def _cat_chain(spec: CWFStepSpec, params, x, c_views, rev: bool, qpack=None):
    """The permute/CAT block chain via precomputed (s, t); logdet in fp32.

    With qpack, the paired (s, t) towers run int8; the logdet is computed
    from the same quantized s, so (z, logdet) stay self-consistent."""
    st = _cat_block_st(spec, params, c_views, qpack=qpack)
    logdet = jnp.zeros((x.shape[0],), jnp.float32)
    if not rev:
        for nn in range(1, spec.n_blocks + 1):
            x = _apply_perm(spec.perms[nn - 1], x, inverse=False)
            s, t = st[nn - 1]
            x = jnp.exp(s.astype(x.dtype)) * x + t
            logdet = logdet + jnp.sum(s.astype(jnp.float32),
                                      axis=tuple(range(1, s.ndim)))
        if spec.use_final_perm:
            x = _apply_perm(spec.perms[spec.n_blocks], x, inverse=False)
    else:
        if spec.use_final_perm:
            x = _apply_perm(spec.perms[spec.n_blocks], x, inverse=True)
        for nn in range(spec.n_blocks, 0, -1):
            s, t = st[nn - 1]
            x = (x - t) * jnp.exp(-s.astype(x.dtype))
            logdet = logdet - jnp.sum(s.astype(jnp.float32),
                                      axis=tuple(range(1, s.ndim)))
            x = _apply_perm(spec.perms[nn - 1], x, inverse=True)
    return x, logdet


def _input_block(spec: CWFStepSpec, params, x, c_views, c_mean, rev):
    """Input ConditionalAffineTransform; conditions concatenated as
    [mean_cache | views] (see module docstring)."""
    if spec.disable_low_res_input:
        subnet = (fs.wavelet_flow_subnet2d, params["input_block"]["subnet"])
        conds = (c_views,)
    else:
        subnet = (fs.wavelet_flow_subnet2d_first, params["input_block"]["subnet"])
        conds = (c_mean, c_views)
    return fc.cat_transform(subnet[0], subnet[1], x, conds, rev=rev,
                            clamp=spec.clamp,
                            clamp_activation=spec.clamp_activation)


def _coupling(spec: CWFStepSpec, bp, x, c_views, rev):
    bt = spec.block_type
    conds = (c_views,)
    if bt == "CAT":
        return fc.cat_transform(fs.wavelet_flow_subnet2d, bp["subnet"], x,
                                conds, rev=rev, clamp=spec.clamp,
                                clamp_activation=spec.clamp_activation)
    if bt in ("RNVP", "GLOW", "GIN", "NICE"):
        subnets = {k: (fs.wavelet_flow_subnet2d, v) for k, v in bp.items()}
        return fc.two_sided_coupling(bt, subnets, x, conds, rev=rev,
                                     clamp=spec.clamp,
                                     clamp_activation=spec.clamp_activation)
    if bt == "AI1":
        return fc.all_in_one_block(bp["aio"],
                                   (fs.wavelet_flow_subnet2d, bp["subnet"]),
                                   x, conds, rev=rev, clamp=spec.clamp)
    raise ValueError(bt)


def reset_permutations(spec: CWFStepSpec, seed: int = 1234) -> CWFStepSpec:
    """Regenerate the step's spatial (PermuteDim) permutations with a fresh
    seed (reference reset_perm, networks.py:153-163, applied to finetuned
    steps at CWFA.py:538). The reference draws the axis choice from the
    global RNG at reset time; here a local RandomState(seed) supplies it —
    deterministic, documented divergence.

    Two reference quirks replayed deliberately: (a) reset_perm passes the
    SAME seed (1234) to every PermuteDim, so after a reset all spatial
    permutations are identical (only the pre-seed axis draw differs) —
    weaker inter-block mixing, but the reference's evident intent; (b) the
    reference's loop body only rebinds its loop VARIABLE
    (networks.py:160-162), never storing the new module, so the reference
    reset is actually a complete no-op — we implement the intent, not the
    no-op."""
    import dataclasses as _dc
    from cwfa_tpu.flow.permute import make_spatial_perm
    rng = np.random.RandomState(seed)
    new_perms = []
    for entry in spec.perms:
        if entry[0] == "spatial":
            axis, perm, inv = make_spatial_perm(spec.spatial, seed=seed,
                                                rng=rng)
            new_perms.append(("spatial", axis, perm, inv))
        else:
            new_perms.append(entry)
    return _dc.replace(spec, perms=tuple(new_perms))


def cwf_step_forward(spec: CWFStepSpec, params, v, c_views, c_mean):
    """Normalizing direction: volume -> (z, averages, logdet).

    v: (B, D, H, W); c_views/c_mean: (B, D/2, H, W).
    """
    avg, diff, ld = haar1d_split(v)
    logdet = ld
    x, j = _input_block(spec, params, diff, c_views, c_mean, rev=False)
    logdet = logdet + j
    if spec.block_type == "CAT":
        x, j = _cat_chain(spec, params, x, c_views, rev=False)
        return x, avg, logdet + j
    for nn in range(1, spec.n_blocks + 1):
        x = _apply_perm(spec.perms[nn - 1], x, inverse=False)
        x, j = _coupling(spec, params["blocks"][nn - 1], x, c_views, rev=False)
        logdet = logdet + j
    if spec.use_final_perm:
        x = _apply_perm(spec.perms[spec.n_blocks], x, inverse=False)
    return x, avg, logdet


def cwf_step_reverse(spec: CWFStepSpec, params, z, avg, c_views, c_mean,
                     fast: bool = False, qpack=None, input_s_raw=None):
    """Generative direction: (z, averages) -> (volume, logdet).

    fast=True uses the Pallas fused kernels (inference only: no logdet, no
    gradients); available for CAT steps on TPU.  qpack (quantize_cat_step)
    routes the paired coupling towers through the fused int8 kernel —
    inference only.  input_s_raw: precomputed input-block tower output
    (``input_tower_s_raw``; CAT + low-res input only), letting the caller
    pair input towers across steps."""
    if fast and spec.block_type == "CAT":
        return _cat_reverse_fast(spec, params, z, avg, c_views, c_mean,
                                 qpack=qpack, input_s_raw=input_s_raw)
    x = z
    logdet = jnp.zeros((z.shape[0],), jnp.float32)
    if spec.block_type == "CAT":
        x, logdet = _cat_chain(spec, params, x, c_views, rev=True,
                               qpack=qpack)
    else:
        if spec.use_final_perm:
            x = _apply_perm(spec.perms[spec.n_blocks], x, inverse=True)
        for nn in range(spec.n_blocks, 0, -1):
            x, j = _coupling(spec, params["blocks"][nn - 1], x, c_views,
                             rev=True)
            logdet = logdet + j
            x = _apply_perm(spec.perms[nn - 1], x, inverse=True)
    if (input_s_raw is not None and spec.block_type == "CAT"
            and not spec.disable_low_res_input):
        # input CAT from the precomputed tower output: s = clamp(f(s_raw)),
        # t = -c_mean/sqrt(2) (flow/subnets.wavelet_flow_subnet2d_first);
        # clamp in the compute dtype (see _cat_block_st)
        fcl = fc.clamp_fn(spec.clamp_activation)
        s = (spec.clamp * fcl(input_s_raw)).astype(x.dtype)
        t = -c_mean * jnp.asarray(fs._SQRT2_INV, x.dtype)
        x = (x - t) * jnp.exp(-s)
        logdet = logdet - jnp.sum(s.astype(jnp.float32),
                                  axis=tuple(range(1, s.ndim)))
    else:
        x, j = _input_block(spec, params, x, c_views, c_mean, rev=True)
        logdet = logdet + j
    v, ld = haar1d_merge(avg, x)
    return v, logdet + ld
