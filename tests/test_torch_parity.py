"""Numerical parity of the layer library against torch (CPU) primitives.

The reference is PyTorch; these tests pin our conv / transposed-conv /
batchnorm / activation semantics to torch's, so model-level behavior parity
claims rest on verified primitives. Weights are copied both ways — only the
math is compared.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from cwfa_tpu import nn as cnn  # noqa: E402


def _np(x):
    return np.asarray(x)


def test_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 8, 8).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    b = rng.randn(5).astype(np.float32)
    got = cnn.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                     jnp.asarray(x), padding=1)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(_np(got), want, atol=2e-5)


def test_conv3d_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 2, 4, 5, 6).astype(np.float32)
    w = rng.randn(3, 2, 3, 3, 3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    got = cnn.conv3d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                     jnp.asarray(x), padding=1)
    want = F.conv3d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(_np(got), want, atol=2e-5)


def test_conv_transpose2d_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 6, 6).astype(np.float32)
    w = rng.randn(4, 3, 2, 2).astype(np.float32)  # (in, out, kH, kW)
    b = rng.randn(3).astype(np.float32)
    got = cnn.conv_transpose2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                               jnp.asarray(x), stride=2)
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=2).numpy()
    np.testing.assert_allclose(_np(got), want, atol=2e-5)


def test_batchnorm_train_and_eval_match_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 3, 5, 5).astype(np.float32)
    params, state = cnn.init_batchnorm(3)
    bn = torch.nn.BatchNorm2d(3)
    bn.train()
    want_train = bn(torch.from_numpy(x)).detach().numpy()
    got_train, new_state = cnn.batchnorm(params, state, jnp.asarray(x),
                                         train=True)
    np.testing.assert_allclose(_np(got_train), want_train, atol=1e-4)
    np.testing.assert_allclose(_np(new_state["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(_np(new_state["var"]),
                               bn.running_var.numpy(), atol=1e-4)
    bn.eval()
    x2 = rng.randn(2, 3, 5, 5).astype(np.float32)
    want_eval = bn(torch.from_numpy(x2)).detach().numpy()
    got_eval, _ = cnn.batchnorm(params, new_state, jnp.asarray(x2),
                                train=False)
    np.testing.assert_allclose(_np(got_eval), want_eval, atol=1e-4)


def test_prelu_elu_softplus_match_torch():
    x = np.linspace(-3, 3, 13).astype(np.float32)
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(
        _np(cnn.prelu({"alpha": jnp.asarray([0.25])}, jnp.asarray(x))),
        F.prelu(xt, torch.tensor([0.25])).numpy(), atol=1e-6)
    np.testing.assert_allclose(_np(cnn.elu(jnp.asarray(x))),
                               F.elu(xt).numpy(), atol=1e-6)
    np.testing.assert_allclose(_np(cnn.softplus(jnp.asarray(x))),
                               F.softplus(xt).numpy(), atol=1e-6)


def test_maxpool_matches_adaptive_halving():
    """adaptive_max_pool2d to size//2 equals 2x2/2 maxpool for even inputs
    (reference unet.py:79)."""
    rng = np.random.RandomState(4)
    x = rng.randn(1, 2, 8, 8).astype(np.float32)
    got = cnn.adaptive_max_pool2d_half(jnp.asarray(x))
    want = F.adaptive_max_pool2d(torch.from_numpy(x), 4).numpy()
    np.testing.assert_allclose(_np(got), want, atol=1e-6)


def test_layernorm_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 3, 4, 4).astype(np.float32)
    p = cnn.init_layernorm((3, 4, 4))
    want = F.layer_norm(torch.from_numpy(x), (3, 4, 4), eps=1e-5).numpy()
    got = cnn.layernorm(p, jnp.asarray(x), eps=1e-5)
    np.testing.assert_allclose(_np(got), want, atol=1e-5)


def test_lion_matches_lion_pytorch_math():
    """optax.lion reproduces the Lion update rule the reference optimizer
    implements (sign(b1*m + (1-b1)*g) with decoupled weight decay)."""
    import optax
    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, -0.1, 0.2], np.float32)
    lr, wd, b1, b2 = 1e-2, 1e-1, 0.9, 0.99
    tx = optax.lion(lr, b1=b1, b2=b2, weight_decay=wd)
    st = tx.init(jnp.asarray(w0))
    up, st = tx.update(jnp.asarray(g), st, jnp.asarray(w0))
    w1 = np.asarray(optax.apply_updates(jnp.asarray(w0), up))
    # manual lion step from zero momentum
    m = np.zeros_like(w0)
    update = np.sign(b1 * m + (1 - b1) * g) + wd * w0
    want = w0 - lr * update
    np.testing.assert_allclose(w1, want, atol=1e-6)
