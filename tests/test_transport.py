"""Live transport sources: byte streams -> native ingest -> events.

Round-1 gap coverage: the C++ runtime's API was transport-agnostic but only
file/synthetic producers existed.  These tests stream real bytes over a FIFO
and a TCP socket into the detector and assert events + localization,
including the ``stream --source`` CLI flag end-to-end.
Reference analogue: autonomous chained-DMA acquisition
(src/components/dma_sampler.c:8-56).
"""

import os
import threading
import time

import numpy as np
import pytest

from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.runtime import native_rt, transport
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()


def _scene_pcm(t_len=30_000, event_at=9_000, seed=0):
    """[T, 3] int16 interleaved stream with one known event burst."""
    src = np.array([0.5, 0.4, 1.2])
    src = src * 1.2 / np.linalg.norm(src)
    rng = np.random.default_rng(seed)
    streams = rng.integers(127, 130, size=(3, t_len)).astype(np.float64)
    frame = synth.synth_scene(src, MICS, noise_rms=0.0, seed=seed)[0]
    streams[:, event_at: event_at + 1024] += 110.0 * frame
    return (np.clip(np.round(streams), 0, 255).astype(np.int16).T.copy(),
            src[:2])


def _drain(rt, source, timeout_s=15.0, max_events=None):
    """Collect detector events until the source ends or ``timeout_s``.
    ``max_events`` returns early for sources that never stop on their own
    (the ALSA shim streams forever — without it the test always pays the
    full timeout)."""
    events = []
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        ev = rt.poll()
        if ev is not None:
            events.append(ev)
            if max_events is not None and len(events) >= max_events:
                break
            continue
        if not source.running:
            ev = rt.poll()
            if ev is not None:
                events.append(ev)
            else:
                break
        time.sleep(0.01)
    return events


needs_native = pytest.mark.skipif(
    not native_rt.native_available(), reason="native toolchain unavailable")


@needs_native
def test_fifo_source_native(tmp_path):
    pcm, _ = _scene_pcm()
    path = str(tmp_path / "audio.fifo")
    os.mkfifo(path)
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = transport.open_source(rt, f"fifo://{path}")
    assert isinstance(src, native_rt.NativeSource)  # the C++ reader thread
    transport.stream_pcm_to_fifo(path, pcm)
    events = _drain(rt, src)
    assert len(events) == 1
    frame, stamp = events[0]
    assert frame.shape == (3, 1024)
    assert 9_000 <= stamp <= 11_000
    assert src.tuples_pushed == len(pcm)
    assert src.bytes_read == pcm.nbytes
    src.stop()
    rt.close()


@needs_native
def test_socket_listen_source_native():
    pcm, plane = _scene_pcm(seed=2)
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = transport.open_source(rt, "listen://:0")
    port = src.wait_port()
    assert port > 0
    transport.stream_pcm_to_socket("127.0.0.1", port, pcm)
    events = _drain(rt, src)
    assert len(events) == 1

    # full burst: localize the transported event frame
    import jax.numpy as jnp

    from audio_triangulation_tpu import Localizer

    loc = Localizer.create(MICS)
    out = loc(jnp.asarray(events[0][0], jnp.float32)[None])
    xy = np.asarray(out["xy"])[0]
    assert np.linalg.norm(xy - plane) < 0.1, (xy, plane)
    src.stop()
    rt.close()


@needs_native
def test_socket_connect_source_native():
    """socket:// (connect) against a Python server, bytes dribbled in odd
    chunk sizes so tuple reassembly (carry) is exercised."""
    import socket as socket_mod

    pcm, _ = _scene_pcm(seed=3)
    data = pcm.tobytes()
    srv = socket_mod.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        step = 997  # deliberately not a multiple of the 6-byte tuple
        for i in range(0, len(data), step):
            conn.sendall(data[i: i + step])
        conn.close()
        srv.close()

    threading.Thread(target=serve, daemon=True).start()
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = transport.open_source(rt, f"socket://127.0.0.1:{port}")
    events = _drain(rt, src)
    assert len(events) == 1
    assert src.tuples_pushed == len(pcm)
    src.stop()
    rt.close()


def test_fifo_source_python_fallback(tmp_path):
    """The Python reader gives identical results for PyIngestRuntime."""
    pcm, _ = _scene_pcm(seed=4)
    path = str(tmp_path / "audio.fifo")
    os.mkfifo(path)
    rt = native_rt.PyIngestRuntime(3, 1024)
    transport.stream_pcm_to_fifo(path, pcm)
    src = transport.open_source(rt, f"fifo://{path}", prefer_native=False)
    events = _drain(rt, src)
    assert len(events) == 1
    assert src.tuples_pushed == len(pcm)
    src.stop()


def test_alsa_source_gated():
    """alsa:// either starts (arecord present) or raises a clear error."""
    import shutil

    rt = native_rt.PyIngestRuntime(3, 1024)
    if shutil.which("arecord") is None:
        with pytest.raises(RuntimeError, match="arecord"):
            transport.open_source(rt, "alsa://default")
    else:  # pragma: no cover - depends on host audio
        src = transport.open_source(rt, "alsa://null")
        src.stop()


@needs_native
def test_stream_cli_source_flag(tmp_path, capsys):
    """`stream --source fifo://...` end to end: transported WAV-style PCM ->
    native detector -> per-event localization printed."""
    from audio_triangulation_tpu.cli.main import main

    pcm, plane = _scene_pcm(seed=5)
    path = str(tmp_path / "cli.fifo")
    os.mkfifo(path)
    transport.stream_pcm_to_fifo(path, pcm)
    main(["stream", "--source", f"fifo://{path}", "--max-seconds", "20"])
    out = capsys.readouterr().out
    assert "source closed" in out
    assert "1 events detected" in out or "events detected" in out
    lines = [ln for ln in out.splitlines() if ln.startswith("event @")]
    assert len(lines) == 1
    # printed position is close to the true plane position
    xy_txt = lines[0].split("xy=(")[1].split(")")[0]
    xy = np.array([float(v) for v in xy_txt.split(",")])
    assert np.linalg.norm(xy - plane) < 0.1, (xy, plane)


# ----------------------------------------------------------------------
# Producer churn / reconnect (docs/ROADMAP validation item)
# ----------------------------------------------------------------------

def _wait_tuples(src, n, timeout_s=12.0):
    t0 = time.time()
    while src.tuples_pushed < n and time.time() - t0 < timeout_s:
        time.sleep(0.01)
    assert src.tuples_pushed == n, (src.tuples_pushed, n)


def _poll_all(rt):
    events = []
    while True:
        ev = rt.poll()
        if ev is None:
            return events
        events.append(ev)


@needs_native
def test_fifo_writer_churn_reconnect_native(tmp_path):
    """Three separate writer sessions (close + gap between each) into one
    reconnecting FIFO source: every event survives, the source stays up."""
    path = str(tmp_path / "churn.fifo")
    os.mkfifo(path)
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = transport.open_source(rt, f"fifo://{path}", reconnect=True)
    total = 0
    for seed in range(3):
        pcm, _ = _scene_pcm(seed=seed)
        transport.stream_pcm_to_fifo(path, pcm).join()  # writer closes
        total += len(pcm)
        _wait_tuples(src, total)
        time.sleep(0.15)  # deliberate producer gap (POLLHUP at the reader)
    assert len(_poll_all(rt)) == 3
    assert src.reconnects >= 2, src.reconnects
    assert src.running  # still alive, ready for the next writer
    src.stop()
    rt.close()


@needs_native
def test_listen_reaccept_reconnect_native():
    """A listen source re-accepts a second peer on the SAME port; the
    stream continues mid-event across the disconnect."""
    pcm, _ = _scene_pcm(seed=4)
    half = 10_000  # splits the 9_000..10_024 burst across the two peers
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = transport.open_source(rt, "listen://:0", reconnect=True)
    port = src.wait_port()
    transport.stream_pcm_to_socket("127.0.0.1", port, pcm[:half]).join()
    _wait_tuples(src, half)
    transport.stream_pcm_to_socket("127.0.0.1", port, pcm[half:]).join()
    _wait_tuples(src, len(pcm))
    events = _poll_all(rt)
    assert len(events) == 1  # the split burst was reassembled seamlessly
    assert 9_000 <= events[0][1] <= 11_000
    assert src.reconnects == 1, src.reconnects
    src.stop()
    rt.close()


@needs_native
def test_tcp_redial_reconnect_native():
    """A tcp:// (connect) source re-dials after the server drops it."""
    import socket as socket_mod

    pcm, _ = _scene_pcm(seed=5)
    half = len(pcm) // 2
    srv = socket_mod.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve(chunk):
        def run():
            conn, _ = srv.accept()
            conn.sendall(np.ascontiguousarray(chunk, "<i2").tobytes())
            conn.close()
        t = threading.Thread(target=run, daemon=True)
        t.start()
        return t

    serve(pcm[:half])
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = transport.open_source(rt, f"tcp://127.0.0.1:{port}",
                                reconnect=True)
    _wait_tuples(src, half)
    serve(pcm[half:]).join()
    _wait_tuples(src, len(pcm))
    assert len(_poll_all(rt)) == 1
    # >= 1: after session 2 closes the source immediately re-dials into the
    # server's listen backlog, which may count one more by the time we read
    assert src.reconnects >= 1, src.reconnects
    src.stop()
    rt.close()
    srv.close()


def test_fifo_writer_churn_python_fallback(tmp_path):
    """The Python fallback reader has the same churn semantics."""
    path = str(tmp_path / "churn_py.fifo")
    os.mkfifo(path)
    rt = native_rt.PyIngestRuntime(3, 1024)
    src = transport.open_source(rt, f"fifo://{path}", prefer_native=False,
                                reconnect=True)
    total = 0
    for seed in range(2):
        pcm, _ = _scene_pcm(seed=seed)
        transport.stream_pcm_to_fifo(path, pcm).join()
        total += len(pcm)
        _wait_tuples(src, total)
        time.sleep(0.1)
    assert len(_poll_all(rt)) == 2
    assert src.reconnects >= 1, src.reconnects
    assert src.running
    src.stop()


def test_listen_reaccept_python_fallback():
    pcm, _ = _scene_pcm(seed=6)
    half = 10_000
    rt = native_rt.PyIngestRuntime(3, 1024)
    src = transport.open_source(rt, "listen://:0", prefer_native=False,
                                reconnect=True)
    port = src.wait_port()
    transport.stream_pcm_to_socket("127.0.0.1", port, pcm[:half]).join()
    _wait_tuples(src, half)
    transport.stream_pcm_to_socket("127.0.0.1", port, pcm[half:]).join()
    _wait_tuples(src, len(pcm))
    assert len(_poll_all(rt)) == 1
    assert src.reconnects == 1, src.reconnects
    src.stop()


# ----------------------------------------------------------------------
# Native ALSA capture (dlopen'd libasound).  No audio hardware exists in
# this container, so the tests compile a tiny SHIM library implementing
# the five snd_pcm_* entry points the reader uses: it synthesizes a quiet
# ADC-scale stream with one loud burst, logs the negotiated parameters,
# and injects one -EPIPE overrun to exercise snd_pcm_recover.  The whole
# native path (dlopen -> open -> set_params -> readi loop -> detector ->
# event queue) runs for real; only the hardware is fake.
# ----------------------------------------------------------------------

_FAKE_ALSA_C = r"""
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

typedef struct { long pos; int sent_epipe; } pcm_t;

int snd_pcm_open(void** pcm, const char* name, int stream, int mode) {
  (void)mode;
  if (strcmp(name, "nodev") == 0) return -2;
  pcm_t* p = (pcm_t*)calloc(1, sizeof(pcm_t));
  *pcm = p;
  const char* log = getenv("FAKE_ALSA_LOG");
  if (log) { FILE* f = fopen(log, "a");
             fprintf(f, "open %s stream=%d mode=%d\n", name, stream, mode);
             fclose(f); }
  return 0;
}

int snd_pcm_set_params(void* pcm, int format, int access, unsigned channels,
                       unsigned rate, int resample, unsigned latency_us) {
  (void)pcm; (void)resample; (void)latency_us;
  const char* log = getenv("FAKE_ALSA_LOG");
  if (log) { FILE* f = fopen(log, "a");
             fprintf(f, "params fmt=%d acc=%d ch=%u rate=%u\n",
                     format, access, channels, rate); fclose(f); }
  if (format != 2 || access != 3) return -22;  /* require S16_LE RW_INT */
  return 0;
}

long snd_pcm_readi(void* pcm, void* buf, unsigned long frames) {
  pcm_t* p = (pcm_t*)pcm;
  /* one overrun mid-stream: the reader must snd_pcm_recover and go on */
  if (!p->sent_epipe && p->pos >= 4096) { p->sent_epipe = 1; return -32; }
  int16_t* out = (int16_t*)buf;
  unsigned channels = 3;
  for (unsigned long i = 0; i < frames; ++i) {
    long t = p->pos + (long)i;
    int16_t v = (int16_t)(128 + (t % 3));          /* quiet ADC idle */
    if (t >= 6000 && t < 7024)                     /* loud burst */
      v = (int16_t)(128 + ((t & 1) ? 3000 : -3000));
    for (unsigned c = 0; c < channels; ++c) out[i * channels + c] = v;
  }
  p->pos += (long)frames;
  usleep(500);  /* crude pacing so the reader doesn't spin */
  return (long)frames;
}

int snd_pcm_recover(void* pcm, int err, int silent) {
  (void)pcm; (void)silent;
  const char* log = getenv("FAKE_ALSA_LOG");
  if (log) { FILE* f = fopen(log, "a");
             fprintf(f, "recover %d\n", err); fclose(f); }
  return err == -32 ? 0 : err;
}

int snd_pcm_close(void* pcm) { free(pcm); return 0; }
"""


@pytest.fixture(scope="module")
def fake_alsa(tmp_path_factory):
    """Compile the shim libasound; returns its path."""
    import subprocess

    d = tmp_path_factory.mktemp("fakealsa")
    src = d / "fake_asound.c"
    lib = d / "libfakeasound.so"
    src.write_text(_FAKE_ALSA_C)
    subprocess.run(
        ["g++", "-x", "c", "-shared", "-fPIC", "-O1", "-o", str(lib),
         str(src)], check=True, capture_output=True)
    return str(lib)


@needs_native
def test_alsa_available_probe(fake_alsa):
    rt = native_rt.NativeIngestRuntime(3, 1024)
    assert rt.alsa_available(fake_alsa)
    assert not rt.alsa_available("/nonexistent/libasound.so.2")


@needs_native
def test_alsa_native_capture_end_to_end(fake_alsa, tmp_path, monkeypatch):
    """dlopen -> snd_pcm_readi loop -> detector -> event, with parameter
    negotiation logged by the shim and one recovered overrun."""
    log = tmp_path / "alsa.log"
    monkeypatch.setenv("FAKE_ALSA_LOG", str(log))
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = rt.start_alsa_source("hw:0", sample_rate=50_000,
                               libpath=fake_alsa)
    events = _drain(rt, src, timeout_s=10.0, max_events=1)
    assert events, "no event from the native ALSA path"
    frame, stamp = events[0]
    assert frame.shape == (3, 1024)
    # the burst (|x - 128| = 3000) must be inside the captured frame
    assert np.abs(frame.astype(np.int64) - 128).max() >= 2999
    assert src.error == 0
    # the event can fire mid-burst (before the reader has consumed the
    # full 7024-sample prefix); give the paced shim a moment to catch up
    t0 = time.time()
    while src.tuples_pushed <= 7000 and time.time() - t0 < 3.0:
        time.sleep(0.01)
    assert src.tuples_pushed > 7000
    src.stop()
    text = log.read_text()
    assert "open hw:0 stream=1 mode=1" in text   # capture, NONBLOCK
    # (blocking mode would let a stalled device hang stop()/join)
    assert "params fmt=2 acc=3 ch=3 rate=50000" in text
    assert "recover -32" in text                 # overrun recovered


@needs_native
def test_alsa_open_failure_reported(fake_alsa):
    rt = native_rt.NativeIngestRuntime(3, 1024)
    src = rt.start_alsa_source("nodev", libpath=fake_alsa)
    t0 = time.time()
    while src.running and time.time() - t0 < 5.0:
        time.sleep(0.01)
    assert not src.running
    assert src.error == 2  # kErrDeviceOpen
    src.stop()


@needs_native
def test_alsa_transport_dispatch_native(fake_alsa, monkeypatch):
    """open_source('alsa://...') takes the native path when an ALSA lib is
    loadable (shim substituted for the system probe)."""
    rt = native_rt.NativeIngestRuntime(3, 1024)
    monkeypatch.setattr(
        native_rt.NativeIngestRuntime, "alsa_available",
        lambda self, libpath="": True)
    real = native_rt.NativeIngestRuntime.start_alsa_source

    def patched(self, device="default", **kw):
        kw["libpath"] = fake_alsa
        return real(self, device, **kw)

    monkeypatch.setattr(
        native_rt.NativeIngestRuntime, "start_alsa_source", patched)
    src = transport.open_source(rt, "alsa://plughw:1")
    assert isinstance(src, native_rt.NativeSource)
    t0 = time.time()
    while src.tuples_pushed == 0 and time.time() - t0 < 5.0:
        time.sleep(0.01)
    assert src.tuples_pushed > 0
    src.stop()
