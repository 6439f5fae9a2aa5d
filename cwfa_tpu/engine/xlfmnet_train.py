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
                  seed: int = 0, batch_size: int = 1):
    """Small self-contained fit loop; views (N, 29, H, W),
    gt_volumes (N, D, H, W). Returns (params, state, losses).

    Mini-batches of ``batch_size`` in a per-epoch-shuffled order (one
    compiled step program as long as batch_size divides evenly into the
    reshuffled index stream — the tail wraps around rather than producing
    a second program shape)."""
    import numpy as np

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params, state = init_xlfmnet(k_init, spec)
    tx = optax.lion(learning_rate, b1=0.9, b2=0.99)
    opt_state = tx.init(params)
    step = make_xlfmnet_train_step(spec, tx, loss_kind)
    losses = []
    n = views.shape[0]
    bs = max(1, min(int(batch_size), n))
    rng = np.random.RandomState(seed)
    order: list = []
    for i in range(n_steps):
        while len(order) < bs:
            order.extend(rng.permutation(n).tolist())
        ixs = np.asarray(order[:bs])
        del order[:bs]
        key, k = jax.random.split(key)
        params, state, opt_state, loss = step(
            params, state, opt_state, views[ixs], gt_volumes[ixs], k)
        losses.append(float(loss))
    return params, state, losses


def build_xlfmnet_spec(cfg) -> XLFMNetSpec:
    """The CLI baseline's spec from a CWFAConfig — shared by run_xlfmnet
    and load_xlfmnet so a restored checkpoint rebuilds the exact
    architecture its stored config trained.

    UNet depth capped so tiny volumes keep >= 2px at the bottleneck (the
    flagship 512-side keeps the reference depth of 5).  drop_out=0, NOT
    the reference's 1.0: XLFMNet passes drop_out=1.0 into F.dropout2d
    whose functional default is training=True (networks.py:762,
    unet.py:80) — every channel dropped, always; the model is
    broken-by-construction there, which fits run_CWFA never building it.
    A trainable baseline needs the dropout off."""
    import numpy as np

    from cwfa_tpu.models.unet import UNetSpec

    depth = max(1, min(5, int(np.log2(max(cfg.volume_side_size, 4))) - 2))
    return XLFMNetSpec(
        in_views=cfg.n_lenslets, out_depths=cfg.n_depths,
        unet=UNetSpec(in_channels=cfg.n_depths, n_classes=cfg.n_depths,
                      depth=depth, wf=6, batch_norm=True,
                      skip_conn=False, drop_out=0.0, activation="elu"))


def load_xlfmnet(path: str):
    """Load the newest ``xlfmnet_step_*`` checkpoint from a run dir.

    Returns (spec, params, state, cfg, stats) — enough to run inference
    (``xlfmnet(spec, params, state, views, train=False)``) or resume.
    Counterpart of run_xlfmnet's save; the CWFA loaders never see these
    files (own prefix, see save site)."""
    from cwfa_tpu.engine.checkpoints import (discover_checkpoints,
                                             load_step_checkpoint,
                                             restore_like)

    found = discover_checkpoints(path, prefix="xlfmnet_step_*__ep_*")
    if not found:
        raise FileNotFoundError(f"no xlfmnet_step_* checkpoint in {path!r}")
    _, fname = found[max(found)]      # newest = highest step number
    payload, cfg, stats = load_step_checkpoint(fname)
    spec = build_xlfmnet_spec(cfg)
    params, state = init_xlfmnet(jax.random.PRNGKey(0), spec)
    params = restore_like(params, payload["condition_state_dict"])
    ms = payload.get("model_state_dict")
    if ms:
        state = restore_like(state, ms)
    return spec, params, state, cfg, stats


def run_xlfmnet(cfg, train_ds, test_ds, stats, view_indices,
                output_path: str | None = None, verbose: bool = True):
    """CLI-shaped XLFMNet baseline run for ``--INN_net_type 2``.

    The reference's net_type switch (main.py:99,116) only ever picks a
    pretrained-checkpoint path for type 1 — run_CWFA never constructs the
    XLFMNet it names.  Here type 2 is a working baseline: supervised
    views -> volume regression with the first-step loss menu, evaluated
    with the CWFA eval's exact un-normalization, checkpointed in the
    trainer's msgpack format (posfix ``_xlfmnet``).

    Returns the same ``{tag: results}`` dict shape as ``CWFATrainer.fit``
    (psnr/MAPE/times/nll keys; nll empty — no likelihood model).
    """
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from cwfa_tpu.data.views import extract_views
    from cwfa_tpu.engine.checkpoints import save_step_checkpoint
    from cwfa_tpu.engine.metrics import compute_step_performance

    spec = build_xlfmnet_spec(cfg)

    view_norm = jax.jit(lambda raw: (extract_views(raw, view_indices)
                                     - stats.mean_imgs) / stats.std_imgs)

    def stack_norm(ds, chunk: int = 8):
        """Host-resident normalized (views, vols); raw camera frames round
        through the device in small chunks — the whole stack at once is
        ~100 MB/frame of device residency (25+ GB at the reference's
        250-frame split)."""
        views, vols = [], []
        for ix in range(len(ds)):
            di, li = ds.locate(ix)
            d = ds.datasets[di]
            views.append(np.asarray(d.stacked_views[li]))
            vols.append((np.asarray(d.vols[li], np.float32)
                         - stats.mean_vols) / stats.std_vols)
        out = [np.asarray(view_norm(jnp.asarray(np.stack(
            views[i:i + chunk])))) for i in range(0, len(views), chunk)]
        return np.concatenate(out), np.stack(vols)

    views_n, vols_n = stack_norm(train_ds)
    bs = max(1, min(int(cfg.batch_size), len(train_ds)))
    n_steps = max(int(cfg.epochs), 1) * max(len(train_ds) // bs, 1)
    # numpy (host) arrays on purpose: train_xlfmnet slices per step, so
    # only the active batch rides device memory
    params, state, losses = train_xlfmnet(
        spec, views_n, vols_n, n_steps=n_steps, batch_size=bs,
        learning_rate=cfg.learning_rate_first_step,
        loss_kind=cfg.loss_func_first_step, seed=cfg.seed)
    if verbose:
        print(f"XLFMNet: {n_steps} steps, loss {losses[0]:.5f} -> "
              f"{losses[-1]:.5f}")

    fwd = jax.jit(lambda p, s, v: xlfmnet(spec, p, s, v, train=False)[0])
    warmed = False
    results = {}
    for tag, ds in (("train", train_ds), ("test", test_ds)):
        res = {"psnr": [], "MAPE": [], "times": [], "nll": [],
               "volumes_pred": [], "volumes_gt": [], "CC": None,
               "projections_gt": [], "projections_predicted": []}
        if ds is not None and len(ds):
            # the train stacks were just built for training — don't
            # re-decode ~100 MB/frame of camera pages for the train tag
            tv, tg = ((views_n, vols_n) if ds is train_ds
                      else stack_norm(ds))
            bs = max(int(cfg.batch_size), 1)
            if not warmed:
                # compile + first-dispatch outside the clock: res['times']
                # must be comparable to the CWFA evaluator's warm timings
                np.asarray(fwd(params, state, jnp.asarray(tv[:bs])))
                warmed = True
            t0 = time.perf_counter()
            pred = np.concatenate(
                [np.asarray(fwd(params, state, jnp.asarray(tv[i:i + bs])))
                 for i in range(0, len(tv), bs)])
            dt = (time.perf_counter() - t0) / len(ds)
            for j in range(len(ds)):
                p, m, _, _ = compute_step_performance(
                    tg[j:j + 1], pred[j:j + 1], 0,
                    stats.mean_vols, stats.std_vols)
                res["psnr"].append([p])
                res["MAPE"].append([m])
                res["times"].append(dt)
        results[tag] = res
    if output_path:
        # own prefix: the CWFA loaders' model_step_* discovery must never
        # map this checkpoint onto a flow-step index
        save_step_checkpoint(output_path, step=0,
                             epoch=max(int(cfg.epochs), 1) - 1, cfg=cfg,
                             cond_params=params, model_state=state,
                             prefix="xlfmnet_step_")
    return results
