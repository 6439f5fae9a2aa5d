"""CWF step tests — the BASELINE.json config-1 milestone: a single CWF step
(Haar + couplings) forward NLL on a synthetic volume, plus full round-trip
invertibility for every selectable block type."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cwfa_tpu.models.cwf import (
    build_step_specs, init_cwf_step, cwf_step_forward, cwf_step_reverse)


def _mk(block_type, n_depths=16, spatial=16, n_blocks=2, seed=364898):
    specs = build_step_specs(
        n_depths=n_depths, spatial=spatial, n_flow_steps=1,
        n_blocks=n_blocks, block_type=block_type, internal_ch=8,
        use_bias=True, use_final_perm=True, disable_low_res_input=False,
        global_seed=seed)
    spec = specs[0]
    params = init_cwf_step(jax.random.PRNGKey(0), spec)
    return spec, params


@pytest.mark.parametrize("block_type", ["CAT", "RNVP", "GLOW", "GIN", "NICE", "AI1"])
def test_step_roundtrip(block_type):
    spec, params = _mk(block_type)
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(1, 16, 16, 16).astype(np.float32))
    cv = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    cm = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    z, avg, ld_f = cwf_step_forward(spec, params, v, cv, cm)
    assert z.shape == (1, 8, 16, 16) and avg.shape == (1, 8, 16, 16)
    v2, ld_r = cwf_step_reverse(spec, params, z, avg, cv, cm)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_r), atol=1e-2,
                               rtol=1e-4)


def test_step_forward_nll_synthetic():
    """Config 1: forward NLL on a 64x64x16 synthetic volume, CPU, batch 1."""
    spec, params = _mk("CAT", n_depths=16, spatial=64, n_blocks=1)
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.randn(1, 16, 64, 64).astype(np.float32))
    zeros = jnp.zeros((1, 8, 64, 64), jnp.float32)
    z, avg, logdet = jax.jit(
        lambda p, x: cwf_step_forward(spec, p, x, zeros, zeros))(params, v)
    prior = 0.5 * float(jnp.sum(z.astype(jnp.float32) ** 2))
    nll = (prior - float(logdet[0])) / avg.size
    assert np.isfinite(nll)
    # CAT with zero conditions: s,t are pure biases; z stays finite and close
    # in scale to the input differences
    assert float(jnp.abs(z).max()) < 100.0


def test_step_jit_consistency():
    spec, params = _mk("CAT")
    rng = np.random.RandomState(2)
    v = jnp.asarray(rng.randn(1, 16, 16, 16).astype(np.float32))
    cv = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    cm = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    eager = cwf_step_forward(spec, params, v, cv, cm)
    jitted = jax.jit(lambda p, a, b, c: cwf_step_forward(spec, p, a, b, c))(
        params, v, cv, cm)
    for e, j in zip(eager[:2], jitted[:2]):
        np.testing.assert_allclose(np.asarray(e), np.asarray(j), atol=1e-5)


def test_perm_replayer_determinism():
    s1 = build_step_specs(16, 16, 2, 4, "CAT", 8, True, True, False, 123)
    s2 = build_step_specs(16, 16, 2, 4, "CAT", 8, True, True, False, 123)
    for a, b in zip(s1, s2):
        assert len(a.perms) == len(b.perms) == 5  # 4 blocks + final
        for pa, pb in zip(a.perms, b.perms):
            assert pa[0] == pb[0]
            np.testing.assert_array_equal(pa[-2], pb[-2])
    # different seed -> different final (unseeded) perm stream is allowed to
    # differ; seeded ones (k+nn) must be identical regardless of global seed
    s3 = build_step_specs(16, 16, 2, 4, "CAT", 8, True, True, False, 999)
    np.testing.assert_array_equal(s1[0].perms[0][1], s3[0].perms[0][1])


def test_disable_low_res_variant():
    specs = build_step_specs(16, 16, 1, 2, "CAT", 8, True, True, True, 1)
    spec = specs[0]
    params = init_cwf_step(jax.random.PRNGKey(1), spec)
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.randn(1, 16, 16, 16).astype(np.float32))
    cv = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    z, avg, _ = cwf_step_forward(spec, params, v, cv, None)
    v2, _ = cwf_step_reverse(spec, params, z, avg, cv, None)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=2e-3)


def test_cat_fast_chain_matches_generic():
    """The paired block-diagonal CAT scheduling must be numerically identical
    to applying each block's cat_transform in sequence."""
    from cwfa_tpu.flow import coupling as fc
    from cwfa_tpu.flow import subnets as fs
    from cwfa_tpu.models.cwf import _apply_perm

    spec, params = _mk("CAT", n_depths=16, spatial=16, n_blocks=3)
    rng = np.random.RandomState(5)
    v = jnp.asarray(rng.randn(2, 16, 16, 16).astype(np.float32))
    cv = jnp.asarray(rng.randn(2, 8, 16, 16).astype(np.float32))
    cm = jnp.asarray(rng.randn(2, 8, 16, 16).astype(np.float32))

    z_fast, avg, ld_fast = cwf_step_forward(spec, params, v, cv, cm)

    # slow reference composition
    from cwfa_tpu.flow.haar import haar1d_split
    avg2, diff, ld = haar1d_split(v)
    x, j = fc.cat_transform(
        fs.wavelet_flow_subnet2d_first, params["input_block"]["subnet"],
        diff, (cm, cv), clamp=spec.clamp,
        clamp_activation=spec.clamp_activation)
    ld = ld + j
    for nn in range(1, spec.n_blocks + 1):
        x = _apply_perm(spec.perms[nn - 1], x, inverse=False)
        x, j = fc.cat_transform(
            fs.wavelet_flow_subnet2d, params["blocks"][nn - 1]["subnet"],
            x, (cv,), clamp=spec.clamp, clamp_activation=spec.clamp_activation)
        ld = ld + j
    if spec.use_final_perm:
        x = _apply_perm(spec.perms[spec.n_blocks], x, inverse=False)

    np.testing.assert_allclose(np.asarray(z_fast), np.asarray(x), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_fast), np.asarray(ld), rtol=1e-4)
