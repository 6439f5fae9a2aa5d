"""Mesh construction and sharded train/inference steps.

Design (SURVEY.md §2.6, §5.7-5.8): the CWFA model is small relative to HBM,
so parameters replicate; scaling axes are

- ``data``: frames per chip (data parallel; gradient psum emitted by XLA);
- ``space``: the 512-row image axis, sharded for batch-1 latency mode — XLA's
  SPMD partitioner inserts halo exchanges for the 3x3/7x7 convs, which is the
  TPU-idiomatic stand-in for sequence/context parallelism (the model has no
  attention; its long axes are depth and space).

Depth sharding for the RL deconvolution (each depth's 2-D FFT is independent;
the image sum is one psum) rides the same 'space' axis when used.

All collectives are implicit: jit + NamedSharding — no hand-written NCCL
analogue exists because none is needed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cwfa_tpu.parallel.distributed import assemble_global


def make_mesh(n_data: int | None = None, n_space: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    devs = np.asarray(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(devs, ("data", "space"))


def batch_sharding(mesh: Mesh, with_space: bool = False) -> NamedSharding:
    """(B, C, H, W) arrays: batch over 'data', optionally rows over 'space'."""
    return NamedSharding(
        mesh, P("data", None, "space" if with_space else None, None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded_train_step(mesh: Mesh, train_step_fn, batch_args_ix):
    """Wrap a (jitted) train-step function for SPMD execution: batch-shaped
    args at positions ``batch_args_ix`` are placed with the 'data'(+'space')
    sharding, everything else replicated; XLA then compiles the step SPMD and
    emits the gradient all-reduce itself.  SPMD partitioning is semantics-
    preserving, so the wrapped step computes exactly what the unwrapped one
    does (equivalence-tested on the virtual CPU mesh).

    Placement is per leaf and degrades gracefully: a batch leaf whose
    leading dim does not divide the 'data' axis (a ragged final batch) or
    whose row dim does not divide 'space' falls back to the widest legal
    sharding (no crash, just less parallelism on that call); non-array
    leaves (static ints, None) pass through untouched so jits with static
    arguments survive wrapping."""
    rep = replicate(mesh)
    n_data = mesh.shape["data"]
    n_space = mesh.shape["space"]
    shd = batch_sharding(mesh, with_space=n_space > 1)
    shd_rows = batch_sharding(mesh, with_space=False)

    def place(x, want_shard):
        # pass through non-arrays AND 0-d leaves (numpy scalar ints have
        # ndim == 0; device_put would turn a static jit argument into an
        # unhashable jax Array)
        if not hasattr(x, "ndim") or getattr(x, "ndim", 0) == 0:
            return x
        # multi-process: an already-GLOBAL array (e.g. a cached pyramid
        # produced by an earlier sharded program) cannot go through the
        # per-shard assembly below (its host slices are not addressable);
        # pass it through — jit accepts any input sharding and inserts the
        # reshard itself if the program wants a different one
        if not getattr(x, "is_fully_addressable", True):
            return x
        if want_shard and getattr(x, "ndim", 0) >= 4 \
                and x.shape[0] % n_data == 0:
            if n_space > 1 and x.shape[2] % n_space == 0:
                return assemble_global(x, shd)
            return assemble_global(x, shd_rows)
        return assemble_global(x, rep)

    def wrapper(*args):
        placed = [jax.tree_util.tree_map(
            lambda x, w=(i in batch_args_ix): place(x, w), a)
            for i, a in enumerate(args)]
        return train_step_fn(*placed)
    return wrapper


_RECON_JIT_CACHE: dict = {}
_RECON_JIT_CACHE_MAX = 8    # FIFO-bounded: each entry pins a compiled XLA
                            # program AND the model it closes over; sweeps
                            # over meshes/temperatures must not accumulate
                            # them for the process lifetime


def sharded_reconstruct(mesh: Mesh, model, params, mstate, views_n,
                        mean_caches, key=None, z_temperature: float = 0.0):
    """Reconstruction with batch sharded over 'data' and rows over 'space'.

    The jitted program is cached per (mesh, model, temperature, has-key):
    defining it inside the call would re-trace on EVERY invocation — and
    each new compile here also pays the ~25 ms remote-compile round trip
    (CLAUDE.md), so per-frame serving callers would recompile per frame."""
    shd = batch_sharding(mesh, with_space=mesh.shape["space"] > 1)
    rep = replicate(mesh)

    try:
        hash(model)
        model_key = model
    except TypeError:
        model_key = id(model)
    cache_key = (mesh, model_key, float(z_temperature), key is not None)
    run = _RECON_JIT_CACHE.get(cache_key)
    if run is None:
        @partial(jax.jit, out_shardings=shd)
        def run(params, mstate, views_n, mean_caches, key):
            views_n = jax.lax.with_sharding_constraint(views_n, shd)
            return model.reconstruct(params, mstate, views_n, mean_caches,
                                     z_temperature=z_temperature, rng=key,
                                     train=False,
                                     lrnn_train=key is not None)
        while len(_RECON_JIT_CACHE) >= _RECON_JIT_CACHE_MAX:
            _RECON_JIT_CACHE.pop(next(iter(_RECON_JIT_CACHE)))
        _RECON_JIT_CACHE[cache_key] = run

    place_rep = partial(jax.tree_util.tree_map,
                        lambda x: assemble_global(x, rep))
    params = place_rep(params)
    mstate = place_rep(mstate)
    views_n = assemble_global(views_n, shd)
    b = views_n.shape[0]
    mcs = [assemble_global(jnp.broadcast_to(c, (b,) + c.shape[1:]), shd)
           for c in mean_caches]
    return run(params, mstate, views_n, mcs, key)
