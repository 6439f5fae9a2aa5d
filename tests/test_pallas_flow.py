"""Pallas flow kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from cwfa_tpu.ops.pallas_flow import (
    haar_merge_affine, haar_merge_affine_reference,
    cat_affine, cat_affine_reference)


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
    got = haar_merge_affine_reference(z, s_raw, t, avg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_cat_affine_interpret_roundtrip():
    z, s, t, _ = _inputs(seed=2)
    y = cat_affine(z, s, t, rev=False, interpret=True)
    ref = cat_affine_reference(z, s, t, rev=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
    z2 = cat_affine(y, s, t, rev=True, interpret=True)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=1e-4)


def test_clamp_variants():
    z, s, t, _ = _inputs(seed=3)
    for act in ("ATAN", "TANH", "SIGMOID"):
        y = cat_affine(z, s, t, activation=act, interpret=True)
        ref = cat_affine_reference(z, s, t, activation=act)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5,
                                   err_msg=act)


def test_bf16_storage():
    z, s, t, avg = _inputs(seed=4)
    z16, s16, t16, a16 = (x.astype(jnp.bfloat16) for x in (z, s, t, avg))
    got = haar_merge_affine(z16, s16, t16, a16, interpret=True)
    ref = haar_merge_affine_reference(z16, s16, t16, a16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
