"""Worker process for the TRUE multi-process distributed test.

Launched twice by tests/test_distributed.py::test_two_process_rendezvous
with CWFA_COORDINATOR/CWFA_NUM_PROCESSES/CWFA_PROCESS_ID set; each process
owns 2 virtual CPU devices (xla_force_host_platform_device_count=2), so the
pair forms a real 4-device, 2-process runtime: `initialize_from_env` does a
real `jax.distributed.initialize` rendezvous over local TCP, and the
assertions below replace the monkeypatched claims with execution
(VERDICT round-3 weak item 2).

Checks, each against a host-side numpy oracle:
  1. jit over a 'data'-sharded global array inserts the cross-process
     all-reduce itself (the psum of SURVEY §5.8's plan);
  2. `assemble_global` places a host-replicated array correctly (content
     checked with a position-weighted checksum so shard misplacement is
     caught, not just totals);
  3. `global_batch_array` assembles per-process host-LOCAL blocks
     (`host_local_indices` partition) into the right global batch.
"""

import os
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    if hasattr(jax.config, "jax_cpu_collectives_implementation"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass

    import jax.numpy as jnp
    from cwfa_tpu.parallel.distributed import (assemble_global,
                                               global_batch_array,
                                               host_local_indices,
                                               initialize_from_env,
                                               is_primary)
    from cwfa_tpu.parallel.mesh import batch_sharding, make_mesh, replicate

    assert initialize_from_env() is True
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 2
    assert jax.device_count() == 4
    assert is_primary() == (pid == 0)

    mesh = make_mesh(n_data=4, n_space=1)
    shd = batch_sharding(mesh)
    rep = replicate(mesh)

    # every process holds the identical full batch (shared-storage layout)
    rng = np.random.RandomState(7)
    x = rng.randn(4, 3, 8, 8).astype(np.float32)
    w = (np.arange(x.size, dtype=np.float64).reshape(x.shape) % 13
         ).astype(np.float32)

    # (1)+(2): assemble_global + jitted reduction over the sharded batch;
    # XLA emits the cross-process all-reduce.  The w-checksum is position-
    # dependent: a shard placed at the wrong batch index changes it.
    gx = assemble_global(x, shd)
    gw = assemble_global(w, rep)
    f = jax.jit(lambda v, ww: (jnp.sum(v * v), jnp.vdot(v, ww)))
    s2, chk = f(gx, gw)
    np.testing.assert_allclose(float(s2), float((x * x).sum()), rtol=1e-5)
    np.testing.assert_allclose(float(chk), float((x * w).sum()), rtol=1e-5)

    # (3): host-local feeding — each process only has its own block
    idx = host_local_indices(4)
    assert sorted(host_local_indices(4, 0, 2) + host_local_indices(4, 1, 2)) \
        == [0, 1, 2, 3]
    gb = global_batch_array(np.ascontiguousarray(x[idx]), shd)
    s2b, chkb = f(gb, gw)
    np.testing.assert_allclose(float(s2b), float((x * x).sum()), rtol=1e-5)
    np.testing.assert_allclose(float(chkb), float((x * w).sum()), rtol=1e-5)

    # (4): a REAL sharded train step across the two processes — the
    # flow-step loss under `sharded_train_step` (batch over 'data', XLA
    # emits the cross-process gradient all-reduce), checked against the
    # local unsharded oracle each process computes on its own device.
    import jax.numpy as jnp
    import optax
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.engine import losses as L
    from cwfa_tpu.engine.trainer import make_optimizers
    from cwfa_tpu.models.cond_net import cond_network
    from cwfa_tpu.models.cwf import cwf_step_forward, cwf_step_reverse
    from cwfa_tpu.models.cwfa_model import CWFAModel
    from cwfa_tpu.parallel.mesh import sharded_train_step

    cfg = CWFAConfig(n_depths=8, volume_side_size=16, n_lenslets=4,
                     INN_max_down_steps=2, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4,
                     use_half_precision=0).decode_lrs()
    model = CWFAModel.build(cfg)
    params, _ = model.init(jax.random.PRNGKey(2))
    spec = model.step_specs[0]
    tx_flow, tx_cond, _ = make_optimizers(model)
    rng2 = np.random.RandomState(21)
    side, b = cfg.volume_side_size, 4
    views_n = rng2.randn(b, 4, side, side).astype(np.float32)
    gt0 = rng2.randn(b, cfg.n_depths, side, side).astype(np.float32)
    ups = rng2.randn(b, cfg.n_depths // 2, side, side).astype(np.float32)
    cm = rng2.randn(b, cfg.n_depths // 2, side, side).astype(np.float32)
    opt_f = tx_flow.init(params["flow"][0])
    opt_c = tx_cond.init(params["cond"][0])

    @jax.jit
    def step(fk, ck, opt_f, opt_c, views_n, gt0, ups, cm):
        def loss(args):
            fk, ck = args
            cv = cond_network(ck, views_n, train=False)
            z = jnp.zeros((views_n.shape[0], spec.c_flow, side, side),
                          jnp.float32)
            recon, _ = cwf_step_reverse(spec, fk, z, ups, cv, cm)
            lc = L.recon_loss(cfg.loss_func_reg, gt0, recon)
            zz, _, ld = cwf_step_forward(spec, fk, gt0, cv, cm)
            nll = (0.5 * jnp.sum(zz ** 2) - jnp.sum(ld)) / float(gt0.size)
            return lc * 0.4 + nll * 0.6
        l, (gf, gc) = jax.value_and_grad(loss)((fk, ck))
        uf, opt_f = tx_flow.update(gf, opt_f, fk)
        uc, opt_c = tx_cond.update(gc, opt_c, ck)
        fk2 = optax.apply_updates(fk, uf)
        gnorm = optax.global_norm(gf)
        return l, gnorm, jax.tree_util.tree_leaves(fk2)[0]

    wrapped = sharded_train_step(mesh, step, batch_args_ix=(4, 5, 6, 7))
    l_sh, gn_sh, leaf_sh = wrapped(params["flow"][0], params["cond"][0],
                                   opt_f, opt_c, views_n, gt0, ups, cm)
    l_lo, gn_lo, leaf_lo = step(params["flow"][0], params["cond"][0],
                                opt_f, opt_c, jnp.asarray(views_n),
                                jnp.asarray(gt0), jnp.asarray(ups),
                                jnp.asarray(cm))
    np.testing.assert_allclose(float(l_sh), float(l_lo), rtol=2e-5)
    np.testing.assert_allclose(float(gn_sh), float(gn_lo), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(leaf_sh), np.asarray(leaf_lo),
                               rtol=1e-4, atol=1e-6)

    print(f"DIST_WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
