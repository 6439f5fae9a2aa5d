"""Headline benchmark: 512x512x96 XLFM reconstruction frames/sec on one chip.

Baseline: the PyTorch reference reconstructs one frame in ~0.16 s on GPU
(reference README.md:29) = 6.25 fps; the driver north star is >=25 fps/chip
(BASELINE.md).  vs_baseline = fps / 6.25.

The measured program is the full production path: raw 2160^2 camera frame ->
29 lenslet views -> normalize -> LRNN (UNet + ConvNeXt mean-volume prior) ->
4 inverse CWF steps -> un-normalized 512x512x96 volume, one jitted XLA
program in bf16 compute / fp32 accumulation, batched over frames.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _backend_watchdog(timeout_s: float, what: str = "backend init"):
    """Fail fast when the axon TPU tunnel is unreachable.

    First backend init (and every remote compile) goes through a tunnel;
    when that tunnel is down, the call blocks forever inside a C call no
    signal handler can interrupt — a daemon timer + ``os._exit`` is the
    only reliable bound.  Returns a cancel() callable to invoke once the
    guarded phase completes."""
    import os
    import threading

    def _die():
        print(f"# {what} exceeded {timeout_s:.0f}s — TPU tunnel "
              "unreachable or hung; aborting bench", file=sys.stderr,
              flush=True)
        os._exit(3)

    t = threading.Timer(timeout_s, _die)
    t.daemon = True
    t.start()
    return t.cancel


def main():
    import os

    cancel = _backend_watchdog(
        float(os.environ.get("BENCH_INIT_TIMEOUT", "300")))
    import jax

    n_dev = len(jax.devices())      # forces backend init under the watchdog
    cancel()
    # second, coarser bound for a HALF-up tunnel: init succeeds but a
    # later remote compile hangs; cancelled once the JSON line is out
    # (an importing caller must not be os._exit'd 40 min later), sized so
    # a healthy run (~6 min incl. compiles) finishes far inside it
    cancel_total = _backend_watchdog(
        float(os.environ.get("BENCH_TOTAL_TIMEOUT", "2400")),
        what="bench total runtime")
    print(f"# backend up: {n_dev} device(s), platform "
          f"{jax.devices()[0].platform}", file=sys.stderr)
    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()     # warm driver re-runs skip remote compiles
    import jax.numpy as jnp

    from cwfa_tpu.engine.inference import XLFMReconstructor

    # the flagship rig is defined ONCE, in the driver entry point — the
    # bench must measure exactly the configuration entry() validates
    from __graft_entry__ import _flagship
    cfg, model, params, mstate, stats, vidx, img = _flagship(small=False)
    rng = np.random.RandomState(0)
    side = cfg.volume_side_size

    nf = model.n_flow_steps
    mean_caches = [jnp.asarray(rng.randn(
        1, cfg.n_depths // (2 ** (k + 1)), side, side).astype(np.float32))
        for k in range(nf + 1)]

    compute_dtype = jnp.bfloat16 if cfg.use_half_precision else jnp.float32

    import gc
    best_fps = 0.0
    best_batch = 0
    # batch sweep; BENCH_BATCHES env (comma-separated) bounds it for
    # time-budgeted runs (e.g. BENCH_BATCHES=16 python bench.py)
    batches = tuple(int(b) for b in
                    os.environ.get("BENCH_BATCHES", "8,16,4,1").split(","))
    for batch in batches:
        gc.collect()
        try:
            frames = jnp.asarray(
                rng.rand(batch, img, img).astype(np.float32) * 1000)
            # use_int8: LRNN-UNet int8 path (per-channel calibrated; bounded
            # vs f32 by tests/test_inference.py::test_int8_unet_...)
            recon = XLFMReconstructor(
                model, params, mstate, stats, vidx, mean_caches,
                deterministic=True, compute_dtype=compute_dtype,
                use_int8=True, calib_frames=frames)
            recon.warmup(batch, (img, img))
            fps = recon.throughput(frames, n_repeats=5)
            print(f"# batch={batch}: {fps:.2f} fps (amortized over 5 "
                  "enqueued repeats)", file=sys.stderr)
            if fps > best_fps:
                best_fps, best_batch = fps, batch
        except Exception as e:  # OOM at large batch -> try smaller
            print(f"# batch={batch} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        if best_fps > 0 and batch >= 16:
            break
    # --- training-throughput regression guard (stderr; VERDICT r1 item 10):
    # flagship per-sample step times back the "finetune fits the 5-minute
    # budget" claim (ref CWFA.py:683,1030; README.md:22).
    # BENCH_SKIP_TRAIN=1 skips it for time-budgeted runs.
    if best_fps == 0.0:
        # every batch in the sweep failed — a success-shaped 0-fps JSON
        # would be recorded as a measurement, not an error
        print("# all bench batches failed; no measurement", file=sys.stderr)
        cancel_total()
        sys.exit(4)
    if not os.environ.get("BENCH_SKIP_TRAIN"):
        try:
            train_ms = _train_step_times(cfg, model, params, mstate, stats,
                                         mean_caches)
            print(f"# train_step_ms: {json.dumps(train_ms)}",
                  file=sys.stderr)
        except Exception as e:
            print(f"# train_step_ms failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # batch-1 LATENCY next to the amortized fps: the reference's headline
    # is a latency (~0.16 s/frame, README.md:29).  p50 includes the
    # per-call tunnel fetch RPC (upper bound); min approaches device time.
    lat_p50 = lat_min = None
    try:
        frame1 = jnp.asarray(rng.rand(1, img, img).astype(np.float32) * 1000)
        recon1 = XLFMReconstructor(
            model, params, mstate, stats, vidx, mean_caches,
            deterministic=True, compute_dtype=compute_dtype,
            use_int8=True, calib_frames=frame1)
        recon1.warmup(1, (img, img))
        lat_p50, lat_min = recon1.latency_ms(frame1, n=20)
        print(f"# recon_latency_ms_b1: p50={lat_p50:.1f} min={lat_min:.1f} "
              "(vs reference 160 ms)", file=sys.stderr)
    except Exception as e:
        print(f"# latency_ms_b1 failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # cond-ablated fps at the winning batch (VERDICT r4 item 8): the
    # measured ~23.5 fps platform ceiling rests on two numbers — the
    # shipped time and the cond-free time (docs/CEILING.md §1) — re-measure
    # BOTH every run so drift in either stays visible round-over-round.
    # force_all_steps_NF=1 zeroes the views conditions, dropping the cond
    # nets from the compiled program entirely (the marginal-ablation method,
    # CLAUDE.md round-3).  BENCH_SKIP_ABLATION=1 skips for quick runs.
    abl_fps = None
    if not os.environ.get("BENCH_SKIP_ABLATION") and best_batch:
        try:
            import dataclasses as _dc

            from cwfa_tpu.models.cwfa_model import CWFAModel
            cfg_a = _dc.replace(cfg, force_all_steps_NF=1)
            model_a = CWFAModel.build(cfg_a)
            frames = jnp.asarray(
                rng.rand(best_batch, img, img).astype(np.float32) * 1000)
            recon_a = XLFMReconstructor(
                model_a, params, mstate, stats, vidx, mean_caches,
                deterministic=True, compute_dtype=compute_dtype,
                use_int8=True, calib_frames=frames)
            recon_a.warmup(best_batch, (img, img))
            abl_fps = recon_a.throughput(frames, n_repeats=5)
            print(f"# cond_ablated batch={best_batch}: {abl_fps:.2f} fps "
                  f"(ceiling anchor; shipped {best_fps:.2f})",
                  file=sys.stderr)
        except Exception as e:
            print(f"# cond-ablated fps failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    out = {
        "metric": "recon_fps_512x512x96",
        "value": round(best_fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(best_fps / 6.25, 3),
        # the measured platform ceiling (docs/CEILING.md: cond-free floor
        # + the XLA cond segment's measured floor = ~23.5 fps at batch 16;
        # BASELINE.json's 25 remains reported via vs_baseline above)
        "vs_ceiling": round(best_fps / 23.5, 3),
    }
    if lat_p50 is not None:
        out["latency_ms_b1_p50"] = round(lat_p50, 1)
        out["latency_ms_b1_min"] = round(lat_min, 1)
    if abl_fps is not None:
        out["cond_ablated_fps"] = round(abl_fps, 3)
    print(json.dumps(out))
    cancel_total()


def _train_step_times(cfg, model, params, mstate, stats, mean_caches,
                      n_repeats: int = 5):
    """Batch-1 jitted step times (ms) for the LRNN stage and flow step 0."""
    import time

    import jax
    import jax.numpy as jnp
    import optax

    from cwfa_tpu.engine import losses as L
    from cwfa_tpu.engine.trainer import make_optimizers
    from cwfa_tpu.models.cond_net import cond_network
    from cwfa_tpu.models.cwf import cwf_step_forward, cwf_step_reverse

    rng = np.random.RandomState(1)
    side = cfg.volume_side_size
    # mirror the shipped trainer's --use_half_precision AMP semantics
    # (engine/trainer.py: bf16 network compute, fp32 params/losses/logdets)
    dt = jnp.bfloat16 if cfg.use_half_precision else jnp.float32
    nf = model.n_flow_steps
    spec = model.step_specs[0]
    tx_flow, tx_cond, tx_lrnn = make_optimizers(model)
    views_n = jnp.asarray(rng.randn(1, cfg.n_lenslets, side, side)
                          .astype(np.float32))
    gt0 = jnp.asarray(rng.randn(1, cfg.n_depths, side, side)
                      .astype(np.float32))
    gt_coarse = jnp.asarray(rng.randn(
        1, cfg.n_depths // (2 ** nf), side, side).astype(np.float32))
    upsampled = jnp.asarray(rng.randn(
        1, cfg.n_depths // 2, side, side).astype(np.float32))
    c_mean0 = mean_caches[0][:1].astype(jnp.float32)
    mean_lrnn = mean_caches[nf - 1][:1].astype(jnp.float32)
    opt_l = tx_lrnn.init(params["lrnn"])
    opt_f = tx_flow.init(params["flow"][0])
    opt_c = tx_cond.init(params["cond"][0])

    # batch arrays are ARGUMENTS, not closure constants: closed-over
    # arrays are embedded in the HLO and ride inside every remote-compile
    # request (measured round 4: a batch-2 closure variant overflowed the
    # compile service's body limit with HTTP 413)
    @jax.jit
    def lrnn_step(params, mstate, opt_l, key, views_n, mean_lrnn,
                  gt_coarse):
        def loss(lp):
            out, st = model.run_lrnn({**params, "lrnn": lp}, mstate,
                                     views_n.astype(dt),
                                     mean_lrnn.astype(dt), train=True,
                                     rng=key)
            return L.recon_loss(cfg.loss_func_first_step, gt_coarse,
                                out.astype(jnp.float32)), st
        (l, st), g = jax.value_and_grad(loss, has_aux=True)(params["lrnn"])
        up, opt_l = tx_lrnn.update(g, opt_l, params["lrnn"])
        return optax.apply_updates(params["lrnn"], up), l

    @jax.jit
    def flow_step(fk, ck, opt_f, opt_c, key, views_n, gt0, upsampled,
                  c_mean0):
        def loss(args):
            fk, ck = args
            cv = cond_network(ck, views_n.astype(dt), train=True, rng=key)
            z = jnp.zeros((1, spec.c_flow, side, side), dt)
            recon, _ = cwf_step_reverse(spec, fk, z, upsampled.astype(dt),
                                        cv, c_mean0.astype(dt))
            lc = L.recon_loss(cfg.loss_func_reg, gt0,
                              recon.astype(jnp.float32))
            zz, _, logdet = cwf_step_forward(spec, fk, gt0.astype(dt), cv,
                                             c_mean0.astype(dt))
            # logdets SUMMED like the prior (step_nll contract; == mean
            # only at this microbench's batch 1)
            nll = (0.5 * jnp.sum(zz.astype(jnp.float32) ** 2)
                   - jnp.sum(logdet)) / float(gt0.size)
            return lc * cfg.INN_cond_weight + nll * (1 - cfg.INN_cond_weight)
        l, (gf, gc) = jax.value_and_grad(loss)((fk, ck))
        uf, opt_f = tx_flow.update(gf, opt_f, fk)
        uc, opt_c = tx_cond.update(gc, opt_c, ck)
        return optax.apply_updates(fk, uf), optax.apply_updates(ck, uc), l

    out = {}
    key = jax.random.PRNGKey(0)
    la = (params, mstate, opt_l, key, views_n, mean_lrnn, gt_coarse)
    lp, l = lrnn_step(*la)
    np.asarray(l)                              # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_repeats):
        lp, l = lrnn_step(*la)
    np.asarray(l)
    out["lrnn_stage"] = round((time.perf_counter() - t0) / n_repeats * 1e3, 1)

    fa = (params["flow"][0], params["cond"][0], opt_f, opt_c, key,
          views_n, gt0, upsampled, c_mean0)
    fk, ck, l = flow_step(*fa)
    np.asarray(l)
    t0 = time.perf_counter()
    for _ in range(n_repeats):
        fk, ck, l = flow_step(*fa)
    np.asarray(l)
    out["flow_step0"] = round((time.perf_counter() - t0) / n_repeats * 1e3, 1)
    return out


if __name__ == "__main__":
    main()
