"""HTTP/JSON serving endpoint (runtime.server.LocalizerServer)."""

import json
import urllib.request

import numpy as np
import pytest

from audio_triangulation_tpu import Localizer, PipelineConfig, geometry
from audio_triangulation_tpu.runtime.server import LocalizerServer
from audio_triangulation_tpu.utils import synth

MICS = geometry.reference_array()


@pytest.fixture(scope="module")
def server():
    loc = Localizer.create(MICS, PipelineConfig())
    srv = LocalizerServer(loc, port=0).start()
    yield srv
    srv.stop()


def _req(srv, path, data=None, method=None, headers=None):
    url = f"http://127.0.0.1:{srv.port}{path}"
    req = urllib.request.Request(
        url, data=data, method=method or ("POST" if data else "GET"))
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def _scene(seed=0, noise=0.01):
    plane = np.array([0.8, 0.5])
    src = np.array([0.8, 0.5, 1.2])
    src = src * (1.2 / np.linalg.norm(src))
    frames = synth.synth_scene(src, MICS, noise_rms=noise, seed=seed)
    return plane, frames.astype(np.float32)


def test_healthz_and_config(server):
    code, body = _req(server, "/healthz")
    assert code == 200 and body["ok"] and body["mics"] == 3
    code, body = _req(server, "/config")
    assert code == 200
    assert body["pipeline"]["sample_rate_hz"] == 50_000.0
    assert body["grid"]["height_m"] == 1.2


def test_localize_json_body(server):
    plane, frames = _scene()
    data = json.dumps({"frames": frames.tolist()}).encode()
    code, body = _req(server, "/localize", data,
                      headers={"Content-Type": "application/json"})
    assert code == 200
    xy = np.asarray(body["xy"])[0]
    assert np.linalg.norm(xy - plane) < 0.05, xy
    assert len(body["tdoa_samples"][0]) == 3


def test_localize_raw_float32_body(server):
    plane, frames = _scene(seed=5)
    code, body = _req(
        server, "/localize", frames.tobytes(),
        headers={"Content-Type": "application/octet-stream",
                 "X-Shape": ",".join(str(d) for d in frames.shape)})
    assert code == 200
    xy = np.asarray(body["xy"])[0]
    assert np.linalg.norm(xy - plane) < 0.05, xy


def test_localize_bad_body_is_400_not_crash(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(server, "/localize", b"not json",
             headers={"Content-Type": "application/json"})
    assert e.value.code == 400
    # server still alive
    code, _ = _req(server, "/healthz")
    assert code == 200


def test_streaming_session(server):
    plane, frames = _scene(seed=1, noise=0.0)
    rng = np.random.default_rng(1)
    streams = rng.integers(127, 130, size=(3, 8192)).astype(np.float64)
    streams[:, 3000:3000 + 1024] += 110.0 * frames[0]
    streams = np.clip(np.round(streams), 0, 255).astype(np.float32)

    code, body = _req(server, "/streams", b"{}",
                      headers={"Content-Type": "application/json"})
    assert code == 200
    sid = body["id"]

    chunk = 512
    events = []
    for i in range(0, streams.shape[-1] - chunk + 1, chunk):
        c = np.ascontiguousarray(streams[:, i: i + chunk])
        code, out = _req(
            server, f"/streams/{sid}", c.tobytes(),
            headers={"Content-Type": "application/octet-stream",
                     "X-Shape": f"{c.shape[0]},{c.shape[1]}"})
        assert code == 200
        if out["event"]:
            events.append(out)
    assert events, "no event served"
    assert all("consistency_rms" in e for e in events)  # health metric
    xy = np.asarray(events[0]["xy"])
    assert np.linalg.norm(xy - plane) < 0.15, xy
    assert events[-1]["event_count"] >= 1

    code, _ = _req(server, f"/streams/{sid}", method="DELETE")
    assert code == 200
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(server, f"/streams/{sid}", b"{}",
             headers={"Content-Type": "application/json"})
    assert e.value.code in (400, 404)


def test_oversize_body_is_413(server):
    """Unauthenticated server must reject oversize bodies BEFORE reading
    them (no OOM / no arbitrary-size device work)."""
    big = server.max_body_bytes + 1
    # data first, THEN the Content-Length header (urllib's data setter
    # removes any preset Content-Length): the header lies about the
    # length; the server must 413 on the header alone, unread body
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/localize", data=b"", method="POST")
    req.add_header("Content-Type", "application/octet-stream")
    req.add_header("Content-Length", str(big))
    req.add_header("X-Shape", "1,3,1024")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 413
    code, _ = _req(server, "/healthz")
    assert code == 200


def test_wrong_shape_is_400(server):
    frames = np.zeros((1, 3, 777), np.float32)  # wrong frame length
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(server, "/localize", frames.tobytes(),
             headers={"Content-Type": "application/octet-stream",
                      "X-Shape": "1,3,777"})
    assert e.value.code == 400
    code, _ = _req(server, "/healthz")
    assert code == 200


def test_streaming_session_serves_xyz():
    """A stream_factory with StreamConfig.solve_xyz serves per-event free-3-D
    positions ('xyz'/'xyz_rms_m') alongside the planar solve."""
    from audio_triangulation_tpu.core.config import StreamConfig
    from audio_triangulation_tpu.models.streaming import StreamingLocalizer

    mics = geometry.tetrahedral_array(0.3)
    cfg = PipelineConfig(
        phat=True, band_hz=(700.0, 7000.0), window_enabled=False,
        max_shift_samples=geometry.max_lag_for_array(mics, PipelineConfig()))
    loc = Localizer.create(mics, cfg)
    srv = LocalizerServer(
        loc, port=0,
        stream_factory=lambda: StreamingLocalizer.create(
            mics, cfg, stream=StreamConfig(solve_xyz=True),
            with_solver=True)).start()
    try:
        src = np.array([0.4, -0.3, 1.7])
        frames = synth.synth_scene(src, mics, noise_rms=0.0, seed=7)
        rng = np.random.default_rng(7)
        streams = rng.integers(127, 130, size=(4, 8192)).astype(np.float64)
        streams[:, 3000:3000 + 1024] += 110.0 * frames[0]
        streams = np.clip(np.round(streams), 0, 255).astype(np.float32)

        code, body = _req(srv, "/streams", b"{}",
                          headers={"Content-Type": "application/json"})
        assert code == 200
        sid = body["id"]
        got = None
        for i in range(0, streams.shape[-1] - 511, 512):
            c = np.ascontiguousarray(streams[:, i: i + 512])
            code, out = _req(
                srv, f"/streams/{sid}", c.tobytes(),
                headers={"Content-Type": "application/octet-stream",
                         "X-Shape": f"{c.shape[0]},{c.shape[1]}"})
            assert code == 200
            if out["event"]:
                got = out
        assert got is not None and "xyz" in got, got
        assert np.linalg.norm(np.asarray(got["xyz"]) - src) < 0.15, got
        assert got["xyz_rms_m"] < 0.05
    finally:
        srv.stop()
