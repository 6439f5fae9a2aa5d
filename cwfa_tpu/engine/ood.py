"""Out-of-distribution detection by exact likelihood + fast finetune.

The flagship CWFA workflow (reference README.md:22, SURVEY.md §5.9): the
forward pass of each pyramid step yields an exact per-frame NLL; a threshold
on step ``--step_LL_to_use`` (default 0) at ``--step_LL_ths_to_use``
(default -1.33, main.py:78-80) flags novel samples, which are then adapted to
with ~5 minutes of per-step finetuning (the reference's driver module
``main_OOD.py`` is absent from its repo; the behavior is fully specified by
evaluate_INN_forward + the stage scheduler, which is what this implements).

Decision rule: NLL above the threshold (lower likelihood than the threshold)
=> out-of-distribution.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cwfa_tpu.data.dataset import ConcatXLFMDataset
from cwfa_tpu.engine.trainer import CWFATrainer


@dataclass
class OODResult:
    nll_per_frame: np.ndarray        # (n_frames, n_flow_steps)
    scores: np.ndarray               # (n_frames,) NLL at step_LL_to_use
    is_ood: np.ndarray               # (n_frames,) bool
    threshold: float
    step_used: int


def detect_ood(trainer: CWFATrainer, dataset: ConcatXLFMDataset,
               step_ll_to_use: int | None = None,
               threshold: float | None = None,
               tag: str | None = None) -> OODResult:
    """Score every frame's forward NLL and threshold it.

    tag: trainer cache namespace for the scored frames.  Default None
    derives a per-dataset-object tag — two DIFFERENT datasets must not
    alias each other's (tag, frame-index) NLL/pyramid cache entries
    (scoring fish A then fish B with one tag would return A's cached
    NLLs for B).  Pass an explicit tag (e.g. 'train') only to share
    caches with a finetune loop over the SAME dataset."""
    cfg = trainer.cfg
    if tag is None:
        tag = f"ood:{id(dataset)}"
    step = cfg.step_LL_to_use if step_ll_to_use is None else step_ll_to_use
    ths = cfg.step_LL_ths_to_use if threshold is None else threshold
    if len(dataset) == 0:
        nf = trainer.model.n_flow_steps
        empty = np.zeros((0, nf), np.float32)
        return OODResult(nll_per_frame=empty, scores=empty[:, 0],
                         is_ood=empty[:, 0] > ths, threshold=ths,
                         step_used=step)
    trainer.ensure_mean_caches(dataset)
    # batched scoring: frames go through the jitted forward pyramid in
    # cfg.batch_size mini-batches with per-sample NLLs (the reference's
    # batch-1 loop, CWFA.py:789+134, honors no batch size).  Routed through
    # the trainer's version-stamped NLL cache: a first pass uploads each
    # volume once and primes the device-side GT-pyramid cache; re-scoring
    # after finetune (and the finetune epochs themselves, via
    # reuse_caches=True) then runs with ZERO volume re-uploads.
    for di, ixs in trainer._batches(dataset):
        trainer._refresh_nlls(dataset, tag, ixs)
    nlls = np.stack([trainer._frame_nll(dataset, tag, ix)
                     for ix in range(len(dataset))])
    scores = nlls[:, step]
    return OODResult(nll_per_frame=nlls, scores=scores,
                     is_ood=scores > ths, threshold=ths, step_used=step)


def finetune_on_novel(trainer: CWFATrainer, dataset: ConcatXLFMDataset,
                      optimize_steps=(1, 2, 3, 4, 5),
                      epochs_per_step: int = 2, verbose: bool = False,
                      reuse_caches: bool = False):
    """The ~5-minute adaptation loop: retrain the selected pyramid steps on
    the novel frames, coarsest selected step first (reference
    --fine_tune_optimize_steps semantics, CWFA.py:403-412,586-613,748-771).

    ``optimize_steps`` uses the reference's 1-based numbering where step
    S = INN_max_down_steps is the LRNN and 1 is the finest flow step.

    reuse_caches: pass True when ``dataset`` is the SAME object a
    ``detect_ood(trainer, dataset, tag='train')`` pass just scored — the
    detect pass primed the device-side GT pyramids and cached views, so the
    finetune epochs run with zero volume re-uploads (GT pyramids are
    parameter-independent Haar averages; only the parameter-dependent
    upsampled cache must drop).  Default False: a different dataset's frame
    indices would alias stale 'train' cache entries.
    """
    cfg = trainer.cfg
    n_steps = cfg.INN_max_down_steps
    losses = {}
    # the stage-handoff cache is parameter-dependent — always drop it
    trainer.upsampled_cache = {}
    trainer._upsampled_order = []
    if not reuse_caches:
        # novel data invalidates the GT-pyramid/NLL/views caches
        # (clear_gt_cache also drops the eviction log's tag entries)
        trainer.clear_gt_cache("train")
        trainer.nll_cache["train"] = {}
        trainer.views_cache = {k: v for k, v in trainer.views_cache.items()
                               if k[0] != "train"}
        trainer._views_cache_order = [k for k in trainer._views_cache_order
                                      if k[0] != "train"]
    eps = max(cfg.epochs // n_steps, 1)
    # coarsest selected step first (the reference's epoch schedule order);
    # base_epoch = (n_steps - s)*eps makes stage_for_epoch land on stage s-1
    # (trainer stage nf == the LRNN for s == n_steps)
    for s in sorted(set(optimize_steps), reverse=True):
        base_epoch = (n_steps - s) * eps
        stage_losses = []
        for e in range(epochs_per_step):
            # stay inside this stage's epoch window even if epochs_per_step
            # exceeds the schedule's window size
            loss = trainer.train_epoch(dataset, base_epoch + (e % eps))
            stage_losses.append(loss)
            if verbose:
                print(f"finetune step {s} epoch {e}: loss={loss:.5f}")
        losses[s] = stage_losses
    return losses
