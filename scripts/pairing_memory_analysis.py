"""Root-cause instrument for the input-tower pairing regression (VERDICT r2
item #2): compile (no execute) the full reconstruction program under each
pairing mode and compare XLA's own memory analysis + HLO stats.

The round-2 mystery: pairing the big step-0/1 input towers wins 4 ms in
isolation but loses 12 ms in-pipeline.  Hypotheses: (a) the 72-channel
condition concat materializes both cond-net outputs and breaks their
epilogue fusion; (b) the paired s_raw for step 0 (~100 MB/frame) stays live
across the whole step-1 chain, inflating peak HBM and the scheduler's
freedom; (c) the block-diag 72->256 b1 conv hits XLA's slow small-C_in
lowering.  (a)/(b) show up in memory analysis; (c) in the isolated A/B
(which showed a WIN, so (c) is excluded already).

Usage: python scripts/pairing_memory_analysis.py [batch]
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.data.views import make_view_indices, extract_views
from cwfa_tpu.models.cwfa_model import CWFAModel


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = CWFAConfig().decode_lrs()
    img = 2160
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    stats = DatasetStatistics(100.0, 50.0, 100.0, 50.0, 10.0, 5.0)
    side = cfg.volume_side_size
    g = int(np.ceil(np.sqrt(cfg.n_lenslets)))
    half = side // 2
    xs = np.linspace(half, img - half, g).astype(np.int64)
    coords = np.array([(x, y) for x in xs for y in xs][:cfg.n_lenslets])
    vidx = make_view_indices(coords, (img, img), (side, side))
    nf = model.n_flow_steps
    key = jax.random.PRNGKey(1)
    mean_caches = [jax.random.normal(
        jax.random.fold_in(key, k),
        (1, cfg.n_depths // (2 ** (k + 1)), side, side), jnp.bfloat16)
        for k in range(nf + 1)]
    mcs = [jnp.broadcast_to(c, (batch,) + c.shape[1:]) for c in mean_caches]
    frames = jax.random.uniform(key, (batch, img, img), jnp.float32)

    for pair in (False, "hoist", "mid", "tail", True):
        def fn(params, mstate, raw, mcs, pair=pair):
            views = extract_views(raw, vidx)
            vn = ((views - stats.mean_imgs) / stats.std_imgs
                  ).astype(jnp.bfloat16)
            return model.reconstruct(params, mstate, vn, mcs,
                                     z_temperature=0.0, train=False,
                                     lrnn_train=False,
                                     pair_input_towers=pair)
        try:
            comp = jax.jit(fn).lower(params, mstate, frames, mcs).compile()
            ma = comp.memory_analysis()
            stats_str = (
                f"argument={ma.argument_size_in_bytes/1e9:.2f}GB "
                f"output={ma.output_size_in_bytes/1e9:.2f}GB "
                f"temp={ma.temp_size_in_bytes/1e9:.2f}GB "
                f"peak... generated_code={ma.generated_code_size_in_bytes/1e6:.1f}MB"
                if ma is not None else "memory_analysis unavailable")
            print(f"pair={str(pair):6s}: {stats_str}", flush=True)
            try:
                cost = comp.cost_analysis()
                c = cost[0] if isinstance(cost, (list, tuple)) else cost
                flops = c.get("flops", float("nan"))
                bytes_ = c.get("bytes accessed", float("nan"))
                print(f"             flops={flops/1e12:.3f}T "
                      f"bytes={bytes_/1e9:.2f}GB", flush=True)
            except Exception as e:
                print(f"             cost_analysis failed: {e}", flush=True)
        except Exception as e:
            print(f"pair={pair}: compile FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
