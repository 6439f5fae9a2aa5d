"""Reference-scale Richardson-Lucy deconvolution benchmark (TPU).

The reference's headline comparison point is classical RL deconvolution at
~1 min/frame on GPU (reference README.md:20, "100 iterations" README.md:26);
its CLI default is --n_it 50 (main_deconvolve_dataset.py:27).  This script
times cwfa_tpu.ops.deconv.xlfm_deconvolve on one v5e chip at the reference
CLI's exact shapes: camera/PSF 2160^2, volume 600x600x120 -> FFT canvas
2760^2 x 120 depths (load_psf_otf pads to vol+psf, data/psf.py).

Usage: python scripts/bench_deconv.py [n_it ...] [--chunk N] [--repeats N]
         [--batch B]   (frames deconvolved together, reported as s/frame.
                        MEASURED NEGATIVE on v5e: batch 2 = 200.7 ms/iter
                        /frame vs 181.9 at batch 1 (199.1 at chunk 15) —
                        the hoped-for 4 GB OTF-read amortization in the
                        spectral multiplies is already hidden by XLA's
                        scheduling, and doubling the per-slab transform
                        working set degrades superlinearly.  Deconvolve
                        frames one at a time; the flag stays as the rig.)

Timing uses the enqueue-N/fetch-tiny-slice barrier (engine/inference.py
throughput discipline): block_until_ready is unreliable through the axon
tunnel.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.ops.fft_conv import precompute_otf
from cwfa_tpu.ops.deconv import xlfm_deconvolve


def main(argv):
    from cwfa_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    n_its, chunk, repeats, batch = [], 30, 3, 1
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith(("--chunk", "--repeats", "--batch")):
            if "=" in a:
                val = int(a.split("=", 1)[1])
            else:                      # space-separated form: --chunk 30
                i += 1
                val = int(argv[i])
            if a.startswith("--chunk"):
                chunk = val
            elif a.startswith("--batch"):
                batch = val
            else:
                repeats = val
        else:
            n_its.append(int(a))
        i += 1
    n_its = [n for n in n_its if n > 0] or [50, 100]

    n_depths, psf_px, vol_px, img_px = 120, 2160, 600, 2160

    dev = jax.devices()[0]
    print(f"device={dev.platform}:{dev.device_kind} chunk={chunk} "
          f"shapes: psf (1,{n_depths},{psf_px},{psf_px}) img "
          f"(1,1,{img_px},{img_px}) vol ({vol_px},{vol_px},{n_depths})",
          flush=True)

    # synthetic PSF/image generated ON DEVICE (a host 2.2 GB PSF upload
    # through the axon tunnel is minutes): RL runs a fixed iteration
    # count, so timing is shape-dependent only.  Per-depth sum-normalized
    # like load_psf.
    t0 = time.perf_counter()

    @jax.jit
    def make_psf():
        p = jax.random.uniform(jax.random.PRNGKey(0),
                               (1, n_depths, psf_px, psf_px), jnp.float32)
        return p / p.sum(axis=(-2, -1), keepdims=True)

    psf = make_psf()
    otf, full_hw = precompute_otf(psf, (vol_px, vol_px))
    # barrier (otf is a SpecPair on backends without complex support)
    _ = np.asarray(jax.tree.leaves(otf)[0][0, 0, :2, 0])
    print(f"OTF precompute: full_hw={full_hw} "
          f"{otf.nbytes / 1e9:.2f} GB  {time.perf_counter() - t0:.1f} s",
          flush=True)
    del psf
    img_d = jax.device_put(
        np.random.RandomState(0).rand(batch, 1, img_px, img_px)
        .astype(np.float32) * 100.0)

    for n_it in n_its:
        # the axon tunnel kills device programs after ~1 min, so long
        # iteration counts run as chained <=50-iteration segments via
        # init_obj (numerics-identical: RL's loop state is the object)
        segs = []
        left = n_it
        while left > 0:
            segs.append(min(left, 50))
            left -= segs[-1]

        def run():
            vol = None
            for seg in segs:
                vol, est = xlfm_deconvolve(
                    otf, img_d, seg, obj_hw=(vol_px, vol_px),
                    roi_depths=n_depths, depth_chunk=chunk,
                    full_hw=full_hw, init_obj=vol)
            return vol, est
        t0 = time.perf_counter()
        vol, _ = run()
        _ = np.asarray(vol[0, 0, 0, :4])      # compile + run barrier
        t_first = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(repeats):
            vol, _ = run()
        _ = np.asarray(vol[0, 0, 0, :4])
        dt = (time.perf_counter() - t0) / repeats / batch
        print(f"n_it={n_it:4d} batch={batch}: {dt:7.2f} s/frame "
              f"({dt / n_it * 1e3:6.1f} ms/iter, first+compile "
              f"{t_first:.1f} s)  vs reference GPU ~60 s at 100 it",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
