"""Pallas flow kernels vs their jnp references (interpret mode on CPU), and
fast-path equivalence with the differentiable CAT reverse."""

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.ops.pallas_flow import (
    haar_merge_affine, haar_merge_affine_reference,
    cat_affine, cat_affine_reference, clamp_s)


def _inputs(b=1, c=4, h=8, w=128, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, c, h, w).astype(np.float32))
    return mk(), mk(), mk(), mk()


def test_haar_merge_affine_interpret_matches_reference():
    z, s, t, avg = _inputs()
    ref = haar_merge_affine_reference(z, s, t, avg)
    got = haar_merge_affine(z, s, t, avg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert got.shape == (1, 8, 8, 128)


def test_haar_merge_reference_matches_composed_ops():
    """The fused math must equal composing cat_transform(rev) + haar merge."""
    from cwfa_tpu.flow.coupling import cat_transform
    from cwfa_tpu.flow.haar import haar1d_merge

    z, s_raw, t, avg = _inputs(seed=1)

    def subnet(_, cond):
        return jnp.concatenate([s_raw, t], axis=1)

    diff, _ = cat_transform(subnet, None, z, (z,), rev=True)
    want, _ = haar1d_merge(avg, diff)
    got = haar_merge_affine_reference(z, clamp_s(s_raw), t, avg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cat_affine_interpret_roundtrip():
    z, s, t, _ = _inputs(seed=2)
    y = cat_affine(z, s, t, rev=False, interpret=True)
    ref = cat_affine_reference(z, s, t, rev=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    z2 = cat_affine(y, s, t, rev=True, interpret=True)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)


def test_clamp_variants():
    u = jnp.asarray(np.linspace(-20, 20, 7, dtype=np.float32))
    for act in ("ATAN", "TANH", "SIGMOID"):
        s = np.asarray(clamp_s(u, 2.0, act))
        assert np.all(np.abs(s) <= 2.0 + 1e-5), act


def test_bf16_storage():
    z, s, t, avg = _inputs(seed=4)
    z16, s16, t16, a16 = (x.astype(jnp.bfloat16) for x in (z, s, t, avg))
    got = haar_merge_affine(z16, s16, t16, a16, interpret=True)
    ref = haar_merge_affine_reference(z16, s16, t16, a16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_fast_step_reverse_matches_slow():
    """cwf_step_reverse(fast=True) must match the differentiable path."""
    from cwfa_tpu.models.cwf import (build_step_specs, init_cwf_step,
                                     cwf_step_reverse)
    specs = build_step_specs(16, 16, 1, 3, "CAT", 8, True, True, False, 42)
    spec = specs[0]
    params = init_cwf_step(jax.random.PRNGKey(0), spec)
    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(2, 8, 16, 16).astype(np.float32))
    avg = jnp.asarray(rng.randn(2, 8, 16, 16).astype(np.float32))
    cv = jnp.asarray(rng.randn(2, 8, 16, 16).astype(np.float32))
    cm = jnp.asarray(rng.randn(2, 8, 16, 16).astype(np.float32))
    v_slow, _ = cwf_step_reverse(spec, params, z, avg, cv, cm, fast=False)
    v_fast, _ = cwf_step_reverse(spec, params, z, avg, cv, cm, fast=True)
    np.testing.assert_allclose(np.asarray(v_fast), np.asarray(v_slow),
                               atol=2e-4, rtol=1e-4)
