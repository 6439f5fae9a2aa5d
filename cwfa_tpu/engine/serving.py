"""Production streaming reconstruction service.

The reference reconstructs inside its evaluation loop and writes one TIFF
volume per frame (CWFA.py:1047-1055, main_deconvolve_dataset.py's batch
driver is the closest thing to a service).  This module is the
deployment-shaped version for TPU: a fixed-batch, double-buffered pipeline
around :class:`XLFMReconstructor` that overlaps host I/O with device
execution.

Design for the remote-execution platform (see XLFMReconstructor.throughput):
jax dispatch is asynchronous — calling the jitted program returns
future-backed arrays immediately.  The service keeps ONE batch in flight:
while batch N executes on the TPU, the host fetches batch N-1's volumes and
decodes/submits batch N+1's frames, so steady-state throughput equals the
device's batched rate and the ~25 ms dispatch round trip is paid once per
batch, not per frame.

Partial batches are zero-padded to the fixed compiled batch size (one XLA
program, no re-compilation) and the padding outputs are dropped.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class ServiceStats:
    frames_in: int = 0
    frames_out: int = 0
    batches: int = 0
    padded_frames: int = 0
    t_start: float = field(default_factory=time.perf_counter)
    fetch_seconds: float = 0.0
    fetch_bytes: int = 0
    # dispatch-to-COLLECTION times: collection happens at the next flush
    # (double-buffered) or an idle poll, so in watch mode these include up
    # to one poll interval on top of device execution + fetch
    batch_latencies: list = field(default_factory=list)

    @property
    def throughput_fps(self) -> float:
        dt = time.perf_counter() - self.t_start
        return self.frames_out / dt if dt > 0 else 0.0

    def latency_percentile(self, q: float) -> float:
        if not self.batch_latencies:
            return 0.0
        return float(np.percentile(np.asarray(self.batch_latencies), q))

    def summary(self) -> dict:
        return {
            "frames": self.frames_out,
            "batches": self.batches,
            "padded_frames": self.padded_frames,
            "throughput_fps": round(self.throughput_fps, 3),
            "batch_latency_p50_s": round(self.latency_percentile(50), 4),
            "batch_latency_p95_s": round(self.latency_percentile(95), 4),
            "batch_latency_p99_s": round(self.latency_percentile(99), 4),
            # device->host volume fetch: on an attached TPU host this is
            # PCIe (GB/s, negligible); through the axon development tunnel
            # it is an HTTP stream at ~16 MB/s and dominates end-to-end
            # time (~100 MB/volume). Report it so the two are not conflated.
            "fetch_seconds": round(self.fetch_seconds, 2),
            "fetch_bytes": self.fetch_bytes,
        }


class ReconstructionService:
    """Fixed-batch streaming wrapper: submit frames, receive volumes.

    reconstructor: a built (and ideally warmed) XLFMReconstructor.
    batch_size:    the compiled batch size (frames are buffered to it).
    on_volume:     callback(frame_id, volume_np) invoked for every finished
                   frame, in submission order.
    """

    def __init__(self, reconstructor, batch_size: int, img_hw,
                 on_volume=None):
        self._recon = reconstructor
        self._bs = int(batch_size)
        self._img_hw = tuple(img_hw)
        self._on_volume = on_volume
        self._buf: list[tuple[object, np.ndarray]] = []
        self._buf_since: float | None = None   # when _buf went non-empty
        self._inflight = None         # (device_out, ids, n_valid, t_enqueue)
        self.stats = ServiceStats()

    @property
    def pending(self) -> int:
        """Frames buffered but not yet dispatched."""
        return len(self._buf)

    def pending_age(self) -> float:
        """Seconds since the oldest buffered frame arrived (0.0 if none)."""
        if self._buf_since is None:
            return 0.0
        return time.perf_counter() - self._buf_since

    # ------------------------------------------------------------------ api
    def submit(self, frame, frame_id=None):
        """Queue one raw camera frame (H, W); flushes when a batch fills."""
        frame = np.asarray(frame, np.float32)
        if frame.shape != self._img_hw:
            raise ValueError(f"frame shape {frame.shape} != {self._img_hw}")
        if frame_id is None:
            frame_id = self.stats.frames_in
        self.stats.frames_in += 1
        if not self._buf:
            self._buf_since = time.perf_counter()
        self._buf.append((frame_id, frame))
        if len(self._buf) >= self._bs:
            self._flush()

    def flush_partial(self):
        """Dispatch a padded partial batch now (watch-mode idle flush: tail
        frames must not wait for the batch to fill)."""
        if self._buf:
            self._flush()
        self._collect()

    def drain(self):
        """Flush any partial batch and wait for all results."""
        self.flush_partial()
        return self.stats.summary()

    close = drain

    # ------------------------------------------------------------- internal
    def _flush(self):
        batch = self._buf[:self._bs]
        self._buf = self._buf[self._bs:]
        self._buf_since = time.perf_counter() if self._buf else None
        n = len(batch)
        frames = np.zeros((self._bs,) + self._img_hw, np.float32)
        for i, (_, f) in enumerate(batch):
            frames[i] = f
        self.stats.padded_frames += self._bs - n
        # dispatch the NEW batch first, then fetch the previous one: the
        # device executes batch N while the host drains batch N-1's
        # ~100 MB/frame volumes (collect-first serialized t_fetch + t_exec
        # — measured round 4: the tunnel fetch is seconds per batch)
        t0 = time.perf_counter()
        out = self._recon(frames)          # async dispatch
        prev = self._inflight
        self._inflight = (out, [fid for fid, _ in batch], n, t0)
        self.stats.batches += 1
        if prev is not None:
            self._collect_entry(prev)

    def _collect(self):
        if self._inflight is None:
            return
        entry = self._inflight
        self._inflight = None
        self._collect_entry(entry)

    def _collect_entry(self, entry):
        out, ids, n, t0 = entry
        t1 = time.perf_counter()
        host = np.asarray(out)             # device->host fetch (sync point)
        self.stats.fetch_seconds += time.perf_counter() - t1
        self.stats.fetch_bytes += host.nbytes
        self.stats.batch_latencies.append(time.perf_counter() - t0)
        for i in range(n):
            if self._on_volume is not None:
                self._on_volume(ids[i], host[i])
            self.stats.frames_out += 1


def serve_directory(reconstructor, batch_size, img_hw, in_dir, out_dir,
                    pattern=".tif", poll_seconds: float = 0.0,
                    limit: int | None = None, verbose: bool = True,
                    out_dtype=np.float32, max_retries: int = 5):
    """Reconstruct every TIFF frame in a directory (optionally watching for
    new files), writing one volume TIFF per frame — the service-shaped
    version of the reference's per-frame dump loop (CWFA.py:1047-1055).

    Volume writes run on a background thread (bounded queue) so ~100 MB
    TIFF serialization overlaps the TPU compute instead of adding to it.

    Returns the stats summary dict."""
    from cwfa_tpu.data.tiff import BackgroundTiffWriter, read_tiff_stack

    os.makedirs(out_dir, exist_ok=True)
    writer = BackgroundTiffWriter(maxsize=2 * batch_size)

    def enqueue(i, v):
        # dtype conversion happens on the writer thread (put(dtype=...)) —
        # not here in the batch-dispatch latency path
        writer.put(os.path.join(out_dir, f"XLFM_stack_{i}.tif"),
                   v, dtype=out_dtype)

    svc = ReconstructionService(reconstructor, batch_size, img_hw,
                                on_volume=enqueue)
    seen = set()
    fails: dict = {}
    done = 0
    while True:
        names = sorted(f for f in os.listdir(in_dir)
                       if f.endswith(pattern) and f not in seen)
        progressed = False
        for name in names:
            try:
                stack = read_tiff_stack(os.path.join(in_dir, name))
            except Exception as e:
                # partially-written file (camera still flushing): leave it
                # un-seen and retry on the next poll — but a PERMANENTLY
                # corrupt file must not be re-parsed on every poll forever;
                # after max_retries quarantine it (seen, never served)
                fails[name] = fails.get(name, 0) + 1
                if fails[name] >= max_retries:
                    seen.add(name)
                    print(f"serve: quarantined unreadable {name!r} after "
                          f"{fails.pop(name)} attempts: {e}", flush=True)
                continue
            fails.pop(name, None)
            seen.add(name)
            progressed = True
            if stack.ndim == 2:
                stack = stack[None]
            base = os.path.splitext(name)[0]
            for page_ix, page in enumerate(stack):
                fid = base if stack.shape[0] == 1 else f"{base}_p{page_ix}"
                try:
                    svc.submit(page, frame_id=fid)
                except ValueError as e:
                    # wrong-shaped page (thumbnail, different ROI): skip the
                    # file's remaining pages like an unreadable file — one
                    # stray .tif must not kill the watch-mode service
                    print(f"serve: skipped {name!r} page {page_ix}: {e}",
                          flush=True)
                    break
                done += 1
                if limit and done >= limit:
                    break
            if limit and done >= limit:
                break
        if (limit and done >= limit) or not poll_seconds:
            break
        # Flush a partial batch on a fully idle poll, OR when buffered frames
        # have waited longer than one poll interval: a steady trickle slower
        # than batch_size (e.g. one file per poll at batch 8) keeps
        # ``progressed`` True every iteration and would otherwise hold tail
        # frames for up to batch_size polls.
        if not progressed or (svc.pending and
                              svc.pending_age() > poll_seconds):
            svc.flush_partial()
        time.sleep(poll_seconds)
    out = svc.drain()
    writer.close()
    if verbose:
        print(f"served {out['frames']} frames: {out['throughput_fps']} fps, "
              f"p95 batch latency {out['batch_latency_p95_s']} s")
    return out
