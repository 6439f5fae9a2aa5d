"""Cond-net internal profile at flagship shapes: stacked 2-D convs vs the
per-step conv3d pairs (and per step)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.config import CWFAConfig
from cwfa_tpu.models.cwfa_model import CWFAModel
from cwfa_tpu.models.cond_net import (_conv3d_pair, _block_diag_w,
                                      cond_networks_batched)
from cwfa_tpu import nn as cnn


def timeit(fn, *args, n=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[:1])
    return (time.perf_counter() - t0) / n


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = CWFAConfig().decode_lrs()
    model = CWFAModel.build(cfg)
    params, _ = model.init(jax.random.PRNGKey(0))
    side = cfg.volume_side_size
    key = jax.random.PRNGKey(1)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (batch, cfg.n_lenslets, side, side), dt)
    plist = params["cond"]

    @jax.jit
    def f_2d(x):
        """Just the stacked conv1/conv2/down + prelu part."""
        c_outs = [p["conv1"]["w"].shape[0] for p in plist]
        w1 = jnp.concatenate([p["conv1"]["w"] for p in plist], 0)
        b1 = jnp.concatenate([p["conv1"]["b"] for p in plist], 0)
        wd = jnp.concatenate([p["down"]["w"] for p in plist], 0)
        bd = jnp.concatenate([p["down"]["b"] for p in plist], 0)
        w2 = _block_diag_w([p["conv2"]["w"] for p in plist])
        b2 = jnp.concatenate([p["conv2"]["b"] for p in plist], 0)
        y1 = cnn.conv2d({"w": w1, "b": b1}, x)
        segs = np.cumsum([0] + c_outs)
        y1 = jnp.concatenate(
            [cnn.prelu(p["prelu"], y1[:, segs[i]:segs[i + 1]])
             for i, p in enumerate(plist)], axis=1)
        y2 = cnn.conv2d({"w": w2, "b": b2}, y1)
        res = cnn.conv2d({"w": wd, "b": bd}, x)
        outs = []
        for i, p in enumerate(plist):
            seg = slice(segs[i], segs[i + 1])
            outs.append(cnn.prelu(p["prelu"], y2[:, seg] + res[:, seg]))
        return outs
    t = timeit(f_2d, x)
    print(f"2d stack        : {t*1e3:8.2f} ms ({t*1e3/batch:6.2f} ms/frame)")
    outs = f_2d(x)

    for k, p in enumerate(plist):
        d = outs[k].shape[1]
        impls = ["banded", "depthbatch"] if d < 24 else ["depthbatch"]
        for impl in impls:
            def f3(o, p=p, impl=impl):
                act = lambda u: cnn.prelu(p["prelu"], u)
                return _conv3d_pair(p, o, act, 0.0, None, impl)
            t = timeit(jax.jit(f3), outs[k])
            print(f"3d pair k={k} D={d:2d} {impl:10s}: {t*1e3:8.2f} ms "
                  f"({t*1e3/batch:6.2f} ms/frame)")


if __name__ == "__main__":
    main()
