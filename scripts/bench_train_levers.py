"""A/B the round-4 training-step levers at flagship scale (VERDICT item 4).

Baseline: the shipped bf16-AMP flow_step0 (bench.py's program shape:
cond fwd -> reverse recon loss + forward NLL -> value_and_grad -> 2 Lion
updates).  Round-3 profile: traffic-bound (114.6 GB bf16 ~ 143 ms at
~800 GB/s; MXU floor 76 ms).

Levers measured here:
  shared_st : compute the CAT towers' (s, t) ONCE and feed both the
              reverse and the forward re-encode (they depend only on the
              condition, networks.py CAT semantics) — measures whether
              XLA's CSE already dedupes the two tower passes.
  remat_cond: jax.checkpoint around cond_network — a MEMORY lever (the
              y intermediate dominates stored activations); reports step
              time AND whether batch 4 stops OOMing (round-3 note:
              flagship train batch 4 OOMs).
(Tower pairing under value_and_grad is the SHIPPED training form —
_cat_block_st pairs consecutive blocks in the loss path itself — so no
separate 'unpaired' lever exists here.)

Usage: python scripts/bench_train_levers.py [batch] [n_repeats] \
           [cse|steps_base|steps_remat|all]
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")


def timeit(fn, *args, n=6):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    from __graft_entry__ import _flagship
    from cwfa_tpu.engine import losses as L
    from cwfa_tpu.engine.trainer import make_optimizers
    from cwfa_tpu.models.cond_net import cond_network
    from cwfa_tpu.models.cwf import cwf_step_forward, cwf_step_reverse

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    nrep = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    stage = sys.argv[3] if len(sys.argv) > 3 else "all"   # cse | steps | all
    cfg, model, params, mstate, stats, vidx, img = _flagship(small=False)
    rng = np.random.RandomState(1)
    side = cfg.volume_side_size
    dt = jnp.bfloat16
    spec = model.step_specs[0]
    tx_flow, tx_cond, _ = make_optimizers(model)
    views_n = jnp.asarray(rng.randn(batch, cfg.n_lenslets, side, side)
                          .astype(np.float32))
    gt0 = jnp.asarray(rng.randn(batch, cfg.n_depths, side, side)
                      .astype(np.float32))
    upsampled = jnp.asarray(rng.randn(
        batch, cfg.n_depths // 2, side, side).astype(np.float32))
    c_mean0 = jnp.asarray(rng.randn(
        1, cfg.n_depths // 2, side, side).astype(np.float32))
    c_mean0 = jnp.broadcast_to(c_mean0, (batch,) + c_mean0.shape[1:])
    opt_f = tx_flow.init(params["flow"][0])
    opt_c = tx_cond.init(params["cond"][0])

    # --- does XLA CSE the two tower passes (reverse + re-encode share
    # identical (s,t))?  compile-only flop comparison answers without
    # timing: if flops(both) << flops(rev) + flops(fwd), CSE is on.
    def _flops(fn, *a):
        try:
            ca = jax.jit(fn).lower(*a).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return ca.get("flops", 0.0) / 1e12
        except Exception as e:
            print(f"cost_analysis failed: {e}")
            return float("nan")

    cv0 = cond_network(params["cond"][0], views_n.astype(dt), train=False)
    z0 = jnp.zeros((batch, spec.c_flow, side, side), dt)

    def f_rev(fk, cv):
        return cwf_step_reverse(spec, fk, z0, upsampled.astype(dt), cv,
                                c_mean0.astype(dt))[0]

    def f_fwd(fk, cv):
        z, _, ld = cwf_step_forward(spec, fk, gt0.astype(dt), cv,
                                    c_mean0.astype(dt))
        return z, ld

    def f_both(fk, cv):
        return f_rev(fk, cv), f_fwd(fk, cv)

    fk0 = params["flow"][0]
    if stage in ("cse", "all"):
        tr, tf, tb = (_flops(f_rev, fk0, cv0), _flops(f_fwd, fk0, cv0),
                      _flops(f_both, fk0, cv0))
        print(f"tower-CSE check (compile-only TFLOP): rev {tr:.3f} + fwd "
              f"{tf:.3f} = {tr+tf:.3f} vs both {tb:.3f} -> "
              f"{'CSE ACTIVE' if tb < 0.9*(tr+tf) else 'NO CSE'}",
              flush=True)
    if stage == "cse":
        return

    def make_step(remat_cond=False):
        cond_fn = cond_network
        if remat_cond:
            cond_fn = jax.checkpoint(
                functools.partial(cond_network, train=True),
                static_argnums=())

        @jax.jit
        def step(fk, ck, opt_f, opt_c, key, views_n, gt0, upsampled,
                 c_mean0):
            # batch arrays are ARGUMENTS, not closure constants — closed-
            # over arrays ride inside the remote-compile request body
            # (batch 2 closures overflowed the service's length limit,
            # HTTP 413)
            def loss(args):
                fk, ck = args
                if remat_cond:
                    cv = cond_fn(ck, views_n.astype(dt), rng=key)
                else:
                    cv = cond_network(ck, views_n.astype(dt), train=True,
                                      rng=key)
                z = jnp.zeros((batch, spec.c_flow, side, side), dt)
                recon, _ = cwf_step_reverse(spec, fk, z,
                                            upsampled.astype(dt), cv,
                                            c_mean0.astype(dt))
                lc = L.recon_loss(cfg.loss_func_reg, gt0,
                                  recon.astype(jnp.float32))
                zz, _, logdet = cwf_step_forward(spec, fk, gt0.astype(dt),
                                                 cv, c_mean0.astype(dt))
                nll = (0.5 * jnp.sum(zz.astype(jnp.float32) ** 2)
                       - jnp.sum(logdet)) / float(gt0.size)
                return (lc * cfg.INN_cond_weight
                        + nll * (1 - cfg.INN_cond_weight))
            l, (gf, gc) = jax.value_and_grad(loss)((fk, ck))
            uf, opt_f = tx_flow.update(gf, opt_f, fk)
            uc, opt_c = tx_cond.update(gc, opt_c, ck)
            return optax.apply_updates(fk, uf), optax.apply_updates(ck, uc), l
        return step

    key = jax.random.PRNGKey(0)
    results = {}
    variants = [("baseline", {}), ("remat_cond", {"remat_cond": True})]
    if stage == "steps_base":
        variants = variants[:1]
    elif stage == "steps_remat":
        variants = variants[1:]
    for name, kw in variants:
        step = make_step(**kw)
        args = (params["flow"][0], params["cond"][0], opt_f, opt_c, key,
                views_n, gt0, upsampled, c_mean0)
        t0 = time.perf_counter()
        out = step(*args)
        np.asarray(out[-1])
        print(f"{name}: compile+1st {time.perf_counter()-t0:.0f}s",
              flush=True)
        dtm = timeit(lambda: step(*args), n=nrep)
        results[name] = dtm * 1e3
        print(f"{name:>12}: {dtm*1e3:7.1f} ms", flush=True)
        # compile-only memory analysis (peak) for the OOM question
        try:
            lowered = step.lower(*args)
            ma = lowered.compile().memory_analysis()
            peak = getattr(ma, "temp_size_in_bytes", None)
            print(f"{name:>12}: temp bytes {peak/2**30:.2f} GiB"
                  if peak is not None else f"{name}: no memory_analysis",
                  flush=True)
        except Exception as e:
            print(f"{name}: memory_analysis failed: {e}", flush=True)

    base = results.get("baseline")
    for name, v in results.items():
        if name != "baseline" and base:
            print(f"{name} vs baseline: {(v/base-1)*100:+.1f}%")


if __name__ == "__main__":
    main()
