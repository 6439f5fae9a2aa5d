"""Loss and metric functions (reference losses.py:477-500, utils.py:380-394,
CWFA.py:935-946).

Only the losses the engine actually uses are implemented — the reference's
vendored time-series loss zoo (losses.py:15-475) is dead code invoked nowhere
except weighted_mse_loss (SURVEY.md D10)."""

from __future__ import annotations

import jax.numpy as jnp


def weighted_mse_loss(output, target, ths_perc: float = 0.05):
    """MSE double-masked by the 5%-of-max support of BOTH prediction and GT
    (reference losses.py:477-500). Note the reference masks but still divides
    by the full element count (loss.mean())."""
    out_shift = output - output.min()
    tgt_shift = target - target.min()
    out_mask = (out_shift > out_shift.max() * ths_perc).astype(output.dtype)
    tgt_mask = (tgt_shift > tgt_shift.max() * ths_perc).astype(output.dtype)
    loss = (output - target) ** 2 * out_mask * tgt_mask
    return loss.mean()


def mse_loss(output, target):
    return jnp.mean((output - target) ** 2)


def l1_loss(output, target):
    return jnp.mean(jnp.abs(output - target))


def poisson_ll_loss(output, target, eps: float = 1e-8):
    """'LL' first-step loss (CWFA.py:944): mean(pred' - gt' * log(eps+pred'))
    on min-shifted tensors."""
    p = output - output.min()
    g = target - target.min()
    return jnp.mean(p - g * jnp.log(eps + p))


def recon_loss(kind: str, gt, pred):
    """Loss menu for --loss_func_first_step / --loss_func_reg
    (CWFA.py:935-955). Argument roles follow the reference call sites:
    L1/L2/wL2 are invoked as f(curr_gt, upsampled_vol); LL treats the
    prediction as the rate (CWFA.py:944)."""
    if kind == "L1":
        return l1_loss(gt, pred)
    if kind == "L2":
        return mse_loss(gt, pred)
    if kind == "wL2":
        return weighted_mse_loss(gt, pred)
    if kind == "LL":
        return poisson_ll_loss(pred, gt)
    raise ValueError(f"unknown loss {kind!r}")


def psnr(img1, img2, pixel_max: float = 1.0):
    """reference utils.py:380-394 incl. the mse==0 special cases."""
    mse = jnp.mean((img1 - img2) ** 2)
    return jnp.where(
        mse == 0,
        jnp.where(jnp.sum(img1) == 0, 0.0, 100.0),
        20.0 * jnp.log10(pixel_max / jnp.sqrt(jnp.maximum(mse, 1e-38))))


def masked_mae_pct(gt, pred, ths: float = 0.05):
    """The reference's 'MAPE': mean absolute error x100 with the prediction
    thresholded at 5% of its abs-max (CWFA.py:124-127)."""
    p = jnp.where(jnp.abs(pred) < jnp.max(jnp.abs(pred)) * ths, 0.0, pred)
    return jnp.mean(jnp.abs(gt - p)) * 100.0
