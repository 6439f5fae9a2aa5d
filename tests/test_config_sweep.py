"""Randomized architecture-config sweep: invertibility and logdet
antisymmetry must hold for EVERY selectable combination of the reference's
architecture flags, not just the shipped defaults (conditional_wavelet_flow's
flag surface, networks.py:264-368 / main.py:100-110).

Deterministic "random" configs (seeded RandomState) so failures reproduce.
Shapes stay tiny (1 CPU core)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu.models.cwf import (build_step_specs, cwf_step_forward,
                                 cwf_step_reverse, init_cwf_step)

BLOCKS = ["CAT", "RNVP", "GLOW", "GIN", "NICE", "AI1"]
CLAMPS = ["ATAN", "TANH", "SIGMOID"]


def _random_cfg(rng):
    return dict(
        block_type=BLOCKS[rng.randint(len(BLOCKS))],
        n_depths=int(rng.choice([4, 8, 16])),
        spatial=int(rng.choice([8, 16])),
        n_blocks=int(rng.randint(1, 4)),
        internal_ch=int(rng.choice([4, 8])),
        use_bias=bool(rng.randint(2)),
        use_final_perm=bool(rng.randint(2)),
        disable_low_res_input=bool(rng.randint(2)),
        clamp=float(rng.choice([0.7, 2.0, 5.0])),
        clamp_activation=CLAMPS[rng.randint(len(CLAMPS))],
        seed=int(rng.randint(1, 10 ** 6)),
    )


@pytest.mark.parametrize("case", range(12))
def test_random_config_roundtrip(case):
    rng = np.random.RandomState(1000 + case)
    cfg = _random_cfg(rng)
    specs = build_step_specs(
        n_depths=cfg["n_depths"], spatial=cfg["spatial"], n_flow_steps=1,
        n_blocks=cfg["n_blocks"], block_type=cfg["block_type"],
        internal_ch=cfg["internal_ch"], use_bias=cfg["use_bias"],
        use_final_perm=cfg["use_final_perm"],
        disable_low_res_input=cfg["disable_low_res_input"],
        global_seed=cfg["seed"], clamp=cfg["clamp"],
        clamp_activation=cfg["clamp_activation"])
    spec = specs[0]
    params = init_cwf_step(jax.random.PRNGKey(cfg["seed"]), spec)

    d, s = cfg["n_depths"], cfg["spatial"]
    v = jnp.asarray(rng.randn(2, d, s, s).astype(np.float32))
    cv = jnp.asarray(rng.randn(2, d // 2, s, s).astype(np.float32))
    cm = jnp.asarray(rng.randn(2, d // 2, s, s).astype(np.float32))

    z, avg, ld_f = cwf_step_forward(spec, params, v, cv, cm)
    assert z.shape == (2, d // 2, s, s) and avg.shape == (2, d // 2, s, s)
    assert np.isfinite(np.asarray(z)).all(), cfg
    assert np.isfinite(float(jnp.sum(ld_f))), cfg

    v2, ld_r = cwf_step_reverse(spec, params, z, avg, cv, cm)
    scale = max(1.0, float(jnp.max(jnp.abs(v))))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v),
                               atol=5e-3 * scale,
                               err_msg=f"roundtrip failed for {cfg}")
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_r),
                               atol=5e-2, rtol=1e-3,
                               err_msg=f"logdet antisymmetry failed for {cfg}")
