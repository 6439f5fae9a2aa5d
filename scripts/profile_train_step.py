"""Segment profile of the flagship TRAINING step (flow step 0 + LRNN stage).

The recon path has been profiled to its roofline (profile_segments.py,
docs/PERFORMANCE.md); this does the same for the train-step programs that
back the finetune-budget headline (ref CWFA.py:683,1030; README.md:22 "~5
minutes of retraining"):

  cond_fwd   : step-0 cond_network forward (train mode, dropout rng)
  cond_step  : cond net value_and_grad + Lion update alone
  rev_fwd    : cwf_step_reverse step 0 (z=0) given precomputed conditions
  nll_fwd    : step_nll step 0 (the forward re-encode, CWFA.py:966-986)
  loss_fwd   : the composite training loss, forward only
  full_step0 : the trainer's _flow_steps[0] program (grad + 2 Lion updates)
  full_stepK : same for the coarser steps k=1..3
  lrnn_step  : the LRNN-stage program

Also prints compile-only XLA cost analysis (flops / bytes accessed) for
loss_fwd vs full_step0 — the backward's traffic multiple, measured without
running (CLAUDE.md round-3: compile-only analysis is often more decisive
than timing).

Usage: python scripts/profile_train_step.py [batch] [--analysis] [--bf16]

--bf16 casts the BATCH ARRAYS to bf16 so the standalone segment jits
(cond_fwd .. loss_fwd) run AMP; the full_stepK / lrnn_step rows always
follow the shipped trainer's cfg.use_half_precision (default 1 = bf16-AMP
since the round-3 twelfth session; the fp32 A/B is
`use_half_precision=0`)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x.ravel()[:1]),
        jax.tree_util.tree_leaves(out)[-1])
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
    from cwfa_tpu.engine.trainer import CWFATrainer
    from cwfa_tpu.models.cond_net import cond_network
    from cwfa_tpu.models.cwf import cwf_step_reverse

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    analysis = "--analysis" in sys.argv
    bf16 = "--bf16" in sys.argv    # AMP A/B: bf16 batch inputs (params,
                                   # losses, logdets, optimizer stay fp32)

    cfg, model, params, mstate, stats, vidx, img = _flagship(small=False)
    nf = model.n_flow_steps
    side = cfg.volume_side_size
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(1)
    spec = model.step_specs[0]

    tr = CWFATrainer(model, stats, vidx)
    views_n = jnp.asarray(rng.randn(batch, cfg.n_lenslets, side, side)
                          .astype(np.float32))
    gt = [jnp.asarray(rng.randn(batch, cfg.n_depths // (2 ** k), side, side)
                      .astype(np.float32)) for k in range(nf + 1)]
    mean_c = [jnp.asarray(rng.randn(
        batch, cfg.n_depths // (2 ** (k + 1)), side, side)
        .astype(np.float32)) for k in range(nf + 1)]
    if bf16:
        views_n = views_n.astype(jnp.bfloat16)
        gt = [g.astype(jnp.bfloat16) for g in gt]
        mean_c = [m.astype(jnp.bfloat16) for m in mean_c]

    res = {}

    @jax.jit
    def f_cond(ck, v, k):
        return cond_network(ck, v, train=True, rng=k)
    res["cond_fwd"] = timeit(f_cond, tr.params["cond"][0], views_n, key)

    @jax.jit
    def f_cond_step(ck, oc, v, k):
        def loss(c):
            return jnp.sum(cond_network(c, v, train=True, rng=k) ** 2)
        l, g = jax.value_and_grad(loss)(ck)
        up, oc = tr.tx_cond.update(g, oc, ck)
        return optax.apply_updates(ck, up), oc, l
    res["cond_step"] = timeit(f_cond_step, tr.params["cond"][0],
                              tr.opt_cond[0], views_n, key)

    c_views0 = f_cond(tr.params["cond"][0], views_n, key)

    @jax.jit
    def f_rev(fk, cv, up_in, mc):
        z = jnp.zeros((batch, spec.c_flow, side, side), up_in.dtype)
        return cwf_step_reverse(spec, fk, z, up_in, cv, mc)[0]
    res["rev_fwd"] = timeit(f_rev, tr.params["flow"][0], c_views0,
                            gt[1], mean_c[0])

    @jax.jit
    def f_nll(fk, g0, cv, mc):
        pseudo = {"flow": [fk if i == 0 else None for i in range(nf)]}
        return model.step_nll(pseudo, 0, g0, cv, mc)[0]
    res["nll_fwd"] = timeit(f_nll, tr.params["flow"][0], gt[0], c_views0,
                            mean_c[0])

    @jax.jit
    def f_loss(fk, ck, v, mc, g0, up_in, k):
        cv = cond_network(ck, v, train=True, rng=k)
        z = jnp.zeros((batch, spec.c_flow, side, side), g0.dtype)
        recon, _ = cwf_step_reverse(spec, fk, z, up_in, cv, mc)
        loss_c = L.recon_loss(cfg.loss_func_reg, g0, recon)
        pseudo = {"flow": [fk if i == 0 else None for i in range(nf)]}
        nll, _ = model.step_nll(pseudo, 0, g0, cv, mc)
        return (loss_c * cfg.INN_cond_weight
                + nll * (1.0 - cfg.INN_cond_weight))
    largs = (tr.params["flow"][0], tr.params["cond"][0], views_n,
             mean_c[0], gt[0], gt[1], key)
    res["loss_fwd"] = timeit(f_loss, *largs)

    for k in range(nf):
        a = (tr.params["flow"][k], tr.params["cond"][k], tr.opt_flow[k],
             tr.opt_cond[k], views_n, mean_c[k], gt[k], gt[k + 1], key)
        res[f"full_step{k}"] = timeit(tr._flow_steps[k], *a)

    res["lrnn_step"] = timeit(
        tr._lrnn_step, tr.params, tr.mstate, tr.opt_lrnn, views_n,
        mean_c[nf - 1], gt[nf], key)

    print(f"batch={batch}")
    for k, v in res.items():
        print(f"  {k:<12} {v * 1e3:8.1f} ms")

    if analysis:
        for name, fn, a in [("loss_fwd", f_loss, largs),
                            ("full_step0", tr._flow_steps[0],
                             (tr.params["flow"][0], tr.params["cond"][0],
                              tr.opt_flow[0], tr.opt_cond[0], views_n,
                              mean_c[0], gt[0], gt[1], key))]:
            c = jax.jit(fn).lower(*a).compile()
            ca = c.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            print(f"  [{name}] flops={ca.get('flops', 0) / 1e12:.3f}T "
                  f"bytes={ca.get('bytes accessed', 0) / 1e9:.2f}GB")


if __name__ == "__main__":
    main()
