"""Segment profile of the flagship reconstruction at a given batch size.

Times each jitted sub-program separately (amortized-RTT pattern):
  views     : raw frame -> 29 views + normalize
  cond      : cond_networks_batched (all 4 condition nets)
  lrnn      : coarsest-level LRNN
  towers[k] : _cat_block_st for step k (the (s,t) subnet towers)
  chain     : the affine/permute/haar chain given precomputed (s,t)
  full      : the whole XLFMReconstructor program

Usage: python scripts/profile_segments.py [batch]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.data.stats import DatasetStatistics
from cwfa_tpu.data.views import make_view_indices, extract_views
from cwfa_tpu.engine.inference import XLFMReconstructor
from cwfa_tpu.models.cwfa_model import CWFAModel
from cwfa_tpu.models.cwf import _cat_block_st, cwf_step_reverse
from cwfa_tpu.models.cond_net import cond_networks_batched


def timeit(fn, *args, n=8):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x.ravel()[:1]), jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = CWFAConfig().decode_lrs()
    img = 2160
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    stats = DatasetStatistics(100.0, 50.0, 100.0, 50.0, 10.0, 5.0)
    side = cfg.volume_side_size
    g = int(np.ceil(np.sqrt(cfg.n_lenslets)))
    half = side // 2
    xs = np.linspace(half, img - half, g).astype(np.int64)
    coords = np.array([(x, y) for x in xs for y in xs][:cfg.n_lenslets])
    vidx = make_view_indices(coords, (img, img), (side, side))
    nf = model.n_flow_steps
    key = jax.random.PRNGKey(1)
    mean_caches = [jax.random.normal(
        jax.random.fold_in(key, k),
        (1, cfg.n_depths // (2 ** (k + 1)), side, side)) for k in range(nf + 1)]

    dt = jnp.bfloat16 if cfg.use_half_precision else jnp.float32
    frames = jax.random.uniform(key, (batch, img, img), jnp.float32) * 1000
    views_n = jax.random.normal(key, (batch, cfg.n_lenslets, side, side), dt)

    res = {}

    @jax.jit
    def f_views(fr):
        v = extract_views(fr, vidx)
        return ((v - stats.mean_imgs) / stats.std_imgs).astype(dt)
    res["views"] = timeit(f_views, frames)

    @jax.jit
    def f_cond(v):
        return cond_networks_batched(params["cond"], v)
    res["cond(all4)"] = timeit(f_cond, views_n)

    @jax.jit
    def f_lrnn(v):
        mc = jnp.broadcast_to(mean_caches[nf - 1].astype(dt),
                              (batch,) + mean_caches[nf - 1].shape[1:])
        out, _ = model.run_lrnn(params, mstate, v, mc, train=True, rng=None)
        return out
    res["lrnn"] = timeit(f_lrnn, views_n)

    cvs = f_cond(views_n)
    for k in range(nf):
        spec = model.step_specs[k]

        def f_tow(cv, k=k, spec=spec):
            return _cat_block_st(spec, params["flow"][k], cv)
        res[f"towers[{k}]"] = timeit(jax.jit(f_tow), cvs[k])

    from cwfa_tpu.flow import subnets as _fs

    @jax.jit
    def f_inp(cvs):
        return [_fs.wavelet_flow_subnet2d(
            params["flow"][k]["input_block"]["subnet"], cvs[k])
            for k in range(nf)]
    res["input_towers(4)"] = timeit(f_inp, cvs)

    # full reverse step k=0 (towers + input tower + chain + haar)
    spec0 = model.step_specs[0]
    z0 = jnp.zeros((batch, spec0.c_flow, side, side), dt)
    up0 = jax.random.normal(key, (batch, spec0.c_flow, side, side), dt)
    cm0 = jnp.broadcast_to(mean_caches[0].astype(dt),
                           (batch,) + mean_caches[0].shape[1:])

    @jax.jit
    def f_step0(z, up, cv, cm):
        return cwf_step_reverse(spec0, params["flow"][0], z, up, cv, cm)[0]
    res["step0_full"] = timeit(f_step0, z0, up0, cvs[0], cm0)

    recon = XLFMReconstructor(model, params, mstate, stats, vidx, mean_caches,
                              deterministic=True, compute_dtype=dt)
    recon.warmup(batch, (img, img))
    fps = recon.throughput(frames, n_repeats=5)
    res["FULL (ms/frame)"] = 1.0 / fps

    if len(sys.argv) > 2 and sys.argv[2] == "noint8":
        print(f"batch={batch}")
        for k, v in res.items():
            print(f"  {k:20s}: {v*1e3:8.2f} ms  ({v*1e3/batch:6.2f} "
                  f"ms/frame)")
        return

    # int8 section: quantized paired towers (ops/qtower)
    qpacks = model.quantize_steps(params, views_n)
    for k in range(nf):
        spec = model.step_specs[k]
        if qpacks[k] is None:
            continue

        def f_towq(cv, k=k, spec=spec):
            return _cat_block_st(spec, params["flow"][k], cv,
                                 qpack=qpacks[k])
        res[f"towers_i8[{k}]"] = timeit(jax.jit(f_towq), cvs[k])

    recon8 = XLFMReconstructor(model, params, mstate, stats, vidx,
                               mean_caches, deterministic=True,
                               compute_dtype=dt, use_int8=True,
                               calib_frames=frames)
    recon8.warmup(batch, (img, img))
    fps8 = recon8.throughput(frames, n_repeats=5)
    res["FULL int8 (ms/frame)"] = 1.0 / fps8

    print(f"batch={batch}")
    for k, v in res.items():
        print(f"  {k:20s}: {v*1e3:8.2f} ms  ({v*1e3/batch:6.2f} ms/frame)")
    print(f"  fps = {fps:.2f}   fps_int8 = {fps8:.2f}")


if __name__ == "__main__":
    main()
