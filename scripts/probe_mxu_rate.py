"""MXU matmul-rate anchor probe (round-4 VERDICT item 7).

The ceiling math (docs/CEILING.md §2-4) rests on the chip's practical
matmul rate, which drifted 58 -> 42.5 TF/s between sessions when probed
ad-hoc.  This script is the standardized methodology:

- 4096^3 bf16 matmul (f32 accumulation), the CLAUDE.md anchor shape;
- enqueue-N/fetch-tiny-slice execution barrier (block_until_ready is not a
  reliable barrier through the axon tunnel);
- inner amortization over CHAIN dependent matmuls (defeats caching of a
  single result without inflating memory);
- TRIALS independent timed trials after warmup; reports median + IQR +
  min/max, which is the statistic CEILING.md carries.

Usage: python scripts/probe_mxu_rate.py [--json]
Each run appends one line to docs/results/mxu_probe_sessions.jsonl when
run from the repo root (best effort), building the cross-session record
the median-of-sessions anchor is computed from.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe(n: int = 4096, chain: int = 8, trials: int = 7):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.fold_in(key, 1), (n, n), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        x = a
        for _ in range(chain):
            x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
        return x

    out = run(a, b)
    np.asarray(out[0, :2])              # compile + warm
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = run(a, b)
        np.asarray(out[0, :2])          # fetch barrier
        dt = time.perf_counter() - t0
        rates.append(2 * n ** 3 * chain / dt / 1e12)
    rates = np.asarray(rates)
    return {
        "shape": n,
        "chain": chain,
        "trials": trials,
        "tflops_median": round(float(np.median(rates)), 2),
        "tflops_iqr": [round(float(np.percentile(rates, 25)), 2),
                       round(float(np.percentile(rates, 75)), 2)],
        "tflops_min": round(float(rates.min()), 2),
        "tflops_max": round(float(rates.max()), 2),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }


def main():
    res = probe()
    print(json.dumps(res))
    log = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "results",
        "mxu_probe_sessions.jsonl")
    try:
        with open(log, "a") as f:
            f.write(json.dumps(res) + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
