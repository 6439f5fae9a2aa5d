"""Invertibility oracles for testing flow ops.

The reference ships these as runtime utilities
(FrEIA/framework/graph_inn.py:369-407 numerical-jacobian checker;
FrEIA/modules/base.py:17-31 defines the testable contract
``allclose(x, rev(fwd(x)))`` and ``jac_fwd == -jac_rev``).  Here they are
test-support functions used by the unit suite (SURVEY.md §4 test plan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def numerical_logdet(fn, x: np.ndarray) -> float:
    """log|det J| of a bijection y = fn(x) for a single sample (no batch dim)
    via the full autodiff Jacobian — an oracle independent of the closed-form
    log-dets the flow ops report. O(N^2) memory; keep shapes tiny in tests."""
    x = np.asarray(x, np.float32)
    n = x.size

    def flat_fn(xf):
        y = fn(xf.reshape((1,) + x.shape))
        return jnp.reshape(y, (-1,))

    jac = np.asarray(jax.jacobian(flat_fn)(jnp.asarray(x.reshape(-1))),
                     np.float64)
    sign, ld = np.linalg.slogdet(jac)
    return float(ld)


def check_inverse(fwd, rev, x, atol=1e-4):
    """Round-trip check: rev(fwd(x)) == x and jac_fwd == -jac_rev."""
    y, j_fwd = fwd(x)
    x2, j_rev = rev(y)
    ok_x = np.allclose(np.asarray(x), np.asarray(x2), atol=atol)
    ok_j = np.allclose(np.asarray(j_fwd), -np.asarray(j_rev), atol=atol)
    return ok_x, ok_j, np.max(np.abs(np.asarray(x) - np.asarray(x2)))
