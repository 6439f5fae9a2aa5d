"""Probe which XLA TPU compiler options the remote compile service accepts.

The local jaxlib is CPU-only, so TPU flags in XLA_FLAGS die in the local
parser; `jax.jit(..., compiler_options=...)` ships them with the compile
request instead and the remote tpu_compile_helper validates them (bogus
names -> HTTP 500).  This script tries each candidate on a trivial program
and prints accepted/rejected — the accepted set feeds the bench A/Bs
(CWFA_COMPILER_OPTIONS in utils/compile_opts.py).

Usage: python scripts/probe_compiler_flags.py
"""
import jax
import jax.numpy as jnp
import numpy as np

CANDIDATES = [
    # (name, test value)
    ("xla_tpu_scoped_vmem_limit_kib", "65536"),
    ("xla_tpu_enable_dot_strength_reduction", "false"),
    ("xla_tpu_dot_dot_fusion", "true"),
    ("xla_tpu_dot_dot_fusion_duplicated", "true"),
    ("xla_tpu_rwb_fusion", "false"),
    ("xla_tpu_enable_aggressive_loop_fusion_layout_opt", "true"),
    ("xla_tpu_licm_size_inflation_ratio", "2.0"),
    ("xla_tpu_enable_experimental_fusion_cost_model", "true"),
    ("xla_tpu_nd_short_transfer_max_chunks", "256"),
    ("xla_tpu_perform_spmd_cse_prevention", "false"),
    ("xla_tpu_async_copy_bandwidth_scaling_factor", "1.0"),
    ("xla_tpu_memory_bound_loop_optimizer_options", "enabled:true"),
    ("xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("xla_tpu_vector_load_fusion_level", "1"),
    ("xla_tpu_use_repeated_instance_for_preferred_prefetch_time", "true"),
    ("xla_jf_conv_input_fusion", "true"),
    ("xla_jf_conv_output_fusion", "true"),
    ("xla_jf_rematerialization_percent_shared_memory_limit", "100"),
    ("xla_tpu_enable_multi_level_nested_loop_fusion", "true"),
    ("xla_tpu_use_lp_llo_scheduler", "true"),
    ("xla_tpu_msa_inefficient_use_to_copy_ratio", "0.5"),
    ("xla_tpu_enable_copy_fusion", "true"),
    ("xla_tpu_copy_fusion_pad_unpad_ratio", "0.0"),
    ("xla_tpu_enable_aggressive_broadcast_priority_update", "true"),
    ("xla_tpu_alternate_memory_benefit_scaling_factor", "1.0"),
    ("xla_tpu_prefer_async_allocations_over_real_time", "true"),
    ("xla_tpu_enable_all_gather_offload_tracing", "true"),
]


def main():
    results = {}
    for i, (name, val) in enumerate(CANDIDATES):
        # vary the constant so each probe is a distinct executable
        c = float(i + 2)

        def f(a, c=c):
            return a * c + jnp.tanh(a)

        try:
            y = jax.jit(f, compiler_options={name: val})(
                jnp.ones((8, 128), jnp.float32))
            np.asarray(y[:1, :1])
            results[name] = "ACCEPTED"
        except Exception as e:  # noqa: BLE001 - probe must survive anything
            msg = str(e).splitlines()[0][:80]
            results[name] = f"rejected ({msg})"
        print(f"{name:<58} {results[name]}", flush=True)
    n_ok = sum(v == "ACCEPTED" for v in results.values())
    print(f"\n{n_ok}/{len(CANDIDATES)} accepted")


if __name__ == "__main__":
    main()
