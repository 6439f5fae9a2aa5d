"""Isolated timing: 4 per-step input towers (64-wide singles) vs the
cross-step paired form (models/cwf.input_tower_s_raw)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.models.cwfa_model import CWFAModel
from cwfa_tpu.models.cwf import input_tower_s_raw
from cwfa_tpu.flow import subnets as fs

B = 8


def timeit(fn, *args, n=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    cfg = CWFAConfig().decode_lrs()
    model = CWFAModel.build(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    side = cfg.volume_side_size
    key = jax.random.PRNGKey(1)
    cvs = [jax.random.normal(jax.random.fold_in(key, k),
                             (B, s.c_flow, side, side), jnp.bfloat16)
           for k, s in enumerate(model.step_specs)]
    fp = params["flow"]

    @jax.jit
    def singles(cvs):
        return [fs.wavelet_flow_subnet2d(fp[k]["input_block"]["subnet"],
                                         cvs[k])
                for k in range(len(cvs))]
    t = timeit(singles, cvs)
    print(f"4 single towers : {t*1e3:8.2f} ms ({t*1e3/B:6.2f} ms/f)",
          flush=True)

    @jax.jit
    def paired(cvs):
        return input_tower_s_raw(model.step_specs, fp, cvs)
    t = timeit(paired, cvs)
    print(f"2 paired towers : {t*1e3:8.2f} ms ({t*1e3/B:6.2f} ms/f)",
          flush=True)


if __name__ == "__main__":
    main()
