"""Training path for the XLFMNet baseline (--INN_net_type 2).

The reference keeps XLFMNet as the SLNet_XLFMNet predecessor model
(networks.py:758-787); run_CWFA never constructs it, so a minimal supervised
trainer (views -> volume regression with the first-step loss menu) provides
the working equivalent here."""

from __future__ import annotations

import jax
import optax

from cwfa_tpu.engine import losses as L
from cwfa_tpu.models.xlfmnet import XLFMNetSpec, init_xlfmnet, xlfmnet


def make_xlfmnet_train_step(spec: XLFMNetSpec, tx, loss_kind: str = "L2"):
    @jax.jit
    def step(params, state, opt_state, views, gt_volume, key):
        def loss_fn(p):
            out, new_state = xlfmnet(spec, p, state, views, train=True,
                                     rng=key)
            return L.recon_loss(loss_kind, gt_volume, out), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss
    return step


def train_xlfmnet(spec: XLFMNetSpec, views, gt_volumes, n_steps: int = 100,
                  learning_rate: float = 1e-4, loss_kind: str = "L2",
                  seed: int = 0):
    """Small self-contained fit loop; views (N, 29, H, W),
    gt_volumes (N, D, H, W). Returns (params, state, losses)."""
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params, state = init_xlfmnet(k_init, spec)
    tx = optax.lion(learning_rate, b1=0.9, b2=0.99)
    opt_state = tx.init(params)
    step = make_xlfmnet_train_step(spec, tx, loss_kind)
    losses = []
    n = views.shape[0]
    for i in range(n_steps):
        key, k = jax.random.split(key)
        ix = i % n
        params, state, opt_state, loss = step(
            params, state, opt_state, views[ix:ix + 1],
            gt_volumes[ix:ix + 1], k)
        losses.append(float(loss))
    return params, state, losses
