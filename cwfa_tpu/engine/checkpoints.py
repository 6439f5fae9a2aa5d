"""Per-step checkpoints with reference-compatible metadata.

Reference format (networks.py:708-756): one file per pyramid step named
``model_step_<s>__ep_<e>`` holding {'epoch', 'args', 'INN_state_dict',
'condition_state_dict', 'optimizer_state_dict', 'training_statistics'}.
Discovery globs the directory and keeps the highest epoch per step
(CWFA.py:425-469).

Here each checkpoint is a msgpack file (flax.serialization) with the same
logical keys; 'args' is the per-step CWFAConfig dict (cfg rides along so
resume can reconstruct the exact architecture, --fine_tune_use_model_args).
"""

from __future__ import annotations

import glob
import json
import os
import re

import jax
import numpy as np
from flax import serialization

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics


def _to_numpy(tree):
    # to_state_dict first: lists become {"0": ..} dicts so from_state_dict
    # can restore them against the live param structure
    sd = serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), sd)


def save_step_checkpoint(path: str, step: int, epoch: int, cfg: CWFAConfig,
                         inn_params=None, cond_params=None, opt_state=None,
                         train_statistics: DatasetStatistics | None = None,
                         posfix: str = "", model_state=None,
                         prefix: str = "model_step_"):
    """Write ``<path>/<prefix><step>__ep_<epoch><posfix>.msgpack``.

    prefix: non-CWFA models (the XLFMNet baseline) use their own prefix so
    ``discover_checkpoints``'s ``model_step_*`` glob never maps them onto a
    flow-step index.

    model_state: non-parameter model state riding with the LRNN step (the
    UNet BatchNorm running statistics — load-bearing for eval-mode
    inference; the reference's torch state_dict carries them inside
    condition_state_dict, our functional split keeps them separate)."""
    os.makedirs(path, exist_ok=True)
    payload = {
        "epoch": epoch,
        # JSON text: msgpack can't carry tuples, and the config has several
        "args": json.dumps(cfg.to_dict()),
        "INN_state_dict": _to_numpy(inn_params) if inn_params is not None else {},
        "condition_state_dict": (_to_numpy(cond_params)
                                 if cond_params is not None else {}),
        "optimizer_state_dict": (_to_numpy(opt_state)
                                 if opt_state is not None else {}),
        "model_state_dict": (_to_numpy(model_state)
                             if model_state is not None else {}),
        "training_statistics": (list(train_statistics.astuple())
                                if train_statistics is not None else []),
    }
    fname = os.path.join(path, f"{prefix}{step}__ep_{epoch}{posfix}.msgpack")
    # atomic publish (SURVEY §5.3 restartability): a crash mid-write must
    # not leave a corrupt highest-epoch file for resume discovery to pick;
    # the dot-prefixed temp name can never match discover_checkpoints'
    # prefix glob even if orphaned
    tmp = os.path.join(path, "." + os.path.basename(fname) + ".tmp")
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, fname)
    return fname


def discover_checkpoints(path: str, prefix: str = "model_step_*__ep_*",
                         max_epoch: int | None = None):
    """Highest-epoch checkpoint per step (reference load_INN_steps,
    networks.py:732-756). Returns {step: (epoch, filename)}.

    max_epoch: discovery epoch cap (--max_test_load_epoch).  The reference
    ACCEPTS this flag but never consumes it (main.py:89 is its only
    occurrence); here it is honored as the evident intent — checkpoints
    with epoch > max_epoch are ignored (documented divergence)."""
    files = glob.glob(os.path.join(path, prefix))
    best = {}
    for m in files:
        nums = re.findall(r"\d+", os.path.basename(m))
        if len(nums) < 2:
            continue
        step, ep = int(nums[0]), int(nums[1])
        if step < 1 and prefix.startswith("model_step_"):
            # flow steps are 1-based (networks.py:721); a foreign step-0
            # file must not map to index -1.  Scoped to the CWFA prefix:
            # other families (xlfmnet_step_0) discover under their own
            continue
        if max_epoch is not None and ep > max_epoch:
            continue
        if step not in best or ep > best[step][0]:
            best[step] = (ep, m)
    return best


def load_step_checkpoint(fname: str):
    with open(fname, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    cfg = CWFAConfig.from_dict(json.loads(payload["args"]))
    stats = None
    ts = payload.get("training_statistics")
    if ts is not None and len(ts) == 6:
        stats = DatasetStatistics(*[float(t) for t in ts])
    return payload, cfg, stats


def restore_like(template, saved):
    """Restore ``saved`` (numpy pytree from msgpack, dict-keyed) into the
    structure of ``template`` (lists stay lists)."""
    return serialization.from_state_dict(template, saved)


def restore_params_from_payloads(found: dict, model, params, mstate):
    """Pure step->tree restore mapping shared by checkpoint consumers
    (the same index convention as CWFATrainer.load_checkpoints, which
    additionally handles stats/optimizers/LR overrides): file step s maps
    to flow/cond index s-1; s = n_flow_steps+1 carries the LRNN params in
    'condition_state_dict' and its BatchNorm state in 'model_state_dict'.

    found: {step: (epoch, fname)} of .msgpack files.  Returns
    (params, mstate, stats, max_epoch)."""
    nf = model.n_flow_steps
    stats = None
    max_epoch = 0
    for step, (ep, fname) in sorted(found.items()):
        payload, _, st = load_step_checkpoint(fname)
        stats = stats or st
        max_epoch = max(max_epoch, int(ep))
        ix = step - 1
        if ix < nf and payload["INN_state_dict"]:
            flow = list(params["flow"])
            flow[ix] = restore_like(flow[ix], payload["INN_state_dict"])
            params = {**params, "flow": flow}
        if payload["condition_state_dict"]:
            if ix >= nf:
                params = {**params, "lrnn": restore_like(
                    params["lrnn"], payload["condition_state_dict"])}
            else:
                cond = list(params["cond"])
                cond[ix] = restore_like(cond[ix],
                                        payload["condition_state_dict"])
                params = {**params, "cond": cond}
        ms = payload.get("model_state_dict")
        if ms and ix >= nf:
            mstate = {"lrnn": restore_like(mstate["lrnn"], ms)}
    return params, mstate, stats, max_epoch
