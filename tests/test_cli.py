"""CLI smoke tests (the main.c-equivalent wiring)."""

import numpy as np

from audio_triangulation_tpu.cli import main as cli


def test_simulate_writes_dashboard(tmp_path, capsys):
    out = str(tmp_path / "dash.png")
    cli.main(["simulate", "--out", out, "--x", "0.5", "--y", "0.4"])
    captured = capsys.readouterr().out
    assert "estimate" in captured
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_stream_demo(capsys):
    cli.main(["stream", "--duration-samples", "16000", "--chunk", "512"])
    captured = capsys.readouterr().out
    assert "event @" in captured
    assert "native events" in captured


def test_localize_wav_subspace_methods(tmp_path, capsys):
    """--method music/music-coherent: the WAV as one continuous source,
    localized from snapshot covariances instead of event detection."""
    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.utils import io as audio_io
    from audio_triangulation_tpu.utils import synth

    mics = geometry.circular_array(8, 0.15)  # the CLI's circular radius
    p = np.array([0.6, 0.3, 1.2])
    src = p * (1.2 / np.linalg.norm(p))
    rng = np.random.default_rng(7)
    chunks = []
    for s in range(10):
        fr = synth.synth_scene(src, mics, n=1024, seed=100 + s,
                               noise_rms=0.0)[0]
        chunks.append(fr + rng.normal(0, 0.01, fr.shape))
    stream = np.concatenate(chunks, axis=-1)  # [M, 10*1024]
    wav = str(tmp_path / "cont.wav")
    audio_io.write_wav(
        wav, (stream * 1000).astype(np.int16), 50_000)

    def run(*extra):
        cli.main(["localize-wav", wav, "--array", "circular", "--mics",
                  "8", "--snapshots", "10", *extra])
        out = capsys.readouterr().out
        line = [l for l in out.splitlines() if "xy=(" in l][0]
        xy = line.split("xy=(")[1].split(")")[0]
        x, y = (float(v) for v in xy.split(","))
        return np.hypot(x - 0.6, y - 0.3), out

    err_m, _ = run("--method", "music")
    assert err_m < 0.12, err_m
    err_c, _ = run("--method", "music-coherent", "--band", "800:6000")
    assert err_c < 0.12, err_c


def test_gen_window(capsys):
    cli.main(["gen-window", "--length", "64"])
    captured = capsys.readouterr().out
    assert "WINDOW_FUNCTION[64]" in captured
    assert "0x7fff" in captured


def test_calibrate_improves(capsys):
    cli.main(["calibrate", "--events", "16", "--steps", "30",
              "--noise", "0.003"])
    captured = capsys.readouterr().out
    lines = [l for l in captured.splitlines() if "geometry error" in l]
    assert lines
    # "geometry error: A mm -> B mm (...)" with B < A
    a = float(lines[0].split(":")[1].split("mm")[0])
    b = float(lines[0].split("->")[1].split("mm")[0])
    assert b < a


def test_localize_wav(tmp_path, capsys):
    import numpy as np

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.utils import io as audio_io
    from audio_triangulation_tpu.utils import synth

    mics = geometry.reference_array()
    rng = np.random.default_rng(3)
    p = np.array([0.6, 0.5, 1.2]); src = p * (1.2 / np.linalg.norm(p))
    fr = synth.synth_scene(src, mics, seed=3)[0]
    streams = rng.integers(127, 130, size=(3, 10000)).astype(np.float64)
    streams[:, 4000:5024] += 110.0 * fr
    wav = str(tmp_path / "scene.wav")
    audio_io.write_wav(
        wav, np.clip(np.round(streams), 0, 255).astype(np.int16), 50_000)

    cli.main(["localize-wav", wav, "--diagnose"])
    out = capsys.readouterr().out
    assert "event @" in out
    assert "health: consistency rms" in out
    assert "faulty mics none" in out  # all channels healthy here

    # --extract writes a beamformed mono WAV per event
    dst = str(tmp_path / "src.wav")
    cli.main(["localize-wav", wav, "--extract", dst,
              "--extract-method", "das"])
    out = capsys.readouterr().out
    assert "extracted (das)" in out
    mono, rate2 = audio_io.read_wav(str(tmp_path / "src_000.wav"))
    assert rate2 == 50_000 and mono.shape[0] == 1
    assert mono.shape[1] == 1024


def test_localize_wav_dereverb(tmp_path, capsys):
    """--dereverb runs WPE over the file and still localizes the event
    (anechoic input: WPE is a near-no-op, the event must survive)."""
    import numpy as np

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.utils import io as audio_io
    from audio_triangulation_tpu.utils import synth

    mics = geometry.reference_array()
    rng = np.random.default_rng(3)
    p = np.array([0.6, 0.5, 1.2]); src = p * (1.2 / np.linalg.norm(p))
    fr = synth.synth_scene(src, mics, seed=3)[0]
    streams = rng.integers(127, 130, size=(3, 10000)).astype(np.float64)
    streams[:, 4000:5024] += 110.0 * fr
    wav = str(tmp_path / "scene.wav")
    audio_io.write_wav(
        wav, np.clip(np.round(streams), 0, 255).astype(np.int16), 50_000)

    cli.main(["localize-wav", wav, "--dereverb"])
    out = capsys.readouterr().out
    assert "dereverberated: WPE frame=1024" in out
    assert "event @" in out


def test_stream_dereverb_flag(capsys):
    """--dereverb inserts the streaming WPE stage; the synthetic event
    still localizes through it (latency shifts the trigger, not the fix)."""
    cli.main(["stream", "--duration-samples", "16000", "--chunk", "512",
              "--dereverb"])
    out = capsys.readouterr().out
    assert "dereverb: WPE frame=1024 hop=256" in out
    assert "event @" in out


def test_torch_interop():
    from audio_triangulation_tpu.utils import interop

    if not interop.torch_available():
        import pytest

        pytest.skip("torch not installed")
    import numpy as np
    import torch

    x = torch.randn(4, 8)
    j = interop.from_torch(x)
    np.testing.assert_allclose(np.asarray(j), x.numpy(), rtol=1e-6)
    back = interop.to_torch(j)
    np.testing.assert_allclose(back.numpy(), x.numpy(), rtol=1e-6)


def test_doa_command(capsys):
    cli.main(["doa", "--azimuth", "84.0"])
    out = capsys.readouterr().out
    est = float([l for l in out.splitlines() if "SRP estimate" in l][0]
                .split(":")[1].split("deg")[0])
    assert abs(est - 84.0) < 4.0


def test_stream_checkpoint_resume(tmp_path, capsys):
    ck = str(tmp_path / "stream_state")
    cli.main(["stream", "--duration-samples", "12000", "--chunk", "512",
              "--checkpoint", ck])
    first = capsys.readouterr().out
    assert "state ->" in first
    cli.main(["stream", "--duration-samples", "12000", "--chunk", "512",
              "--checkpoint", ck, "--seed", "1"])
    second = capsys.readouterr().out
    assert "resumed from" in second


def test_stream_track_resumes_plain_checkpoint(tmp_path, capsys):
    """A checkpoint saved WITHOUT --track (plain StreamState — also what
    the pre-fused host-tracker version saved) must resume under --track:
    streaming state restored, tracker starts fresh, with a note."""
    ck = str(tmp_path / "plain_state")
    cli.main(["stream", "--duration-samples", "12000", "--chunk", "512",
              "--checkpoint", ck])
    capsys.readouterr()
    cli.main(["stream", "--duration-samples", "12000", "--chunk", "512",
              "--checkpoint", ck, "--seed", "1", "--track"])
    out = capsys.readouterr().out
    assert "tracker state starts fresh" in out
    assert "resumed from" in out


def test_gen_window_plot(tmp_path, capsys):
    out = str(tmp_path / "win.png")
    cli.main(["gen-window", "--length", "128", "--plot", out])
    capsys.readouterr()
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_stream_refresh_hz_free_runs(tmp_path, capsys):
    """--refresh-hz redraws on a stream-time timer regardless of events
    (the reference display free-runs at 60 Hz): a QUIET stream still
    produces the full frame sequence."""
    from audio_triangulation_tpu.cli.main import main

    out_dir = tmp_path / "frames"
    main(["stream", "--duration-samples", "15000", "--noise", "0.0",
          "--seed", "3", "--refresh-hz", "100",
          "--frames-dir", str(out_dir)])
    txt = capsys.readouterr().out
    frames = sorted(out_dir.glob("frame_*.png"))
    # 15000 samples @50 kHz = 0.3 s -> 30 frames at 100 Hz
    assert len(frames) == 30, txt
    assert frames[0].stat().st_size > 100  # real PNGs


def test_stream_track_flag(capsys):
    cli.main(["stream", "--duration-samples", "28000", "--chunk", "512",
              "--track"])
    captured = capsys.readouterr().out
    assert "track #1: spawned" in captured
    # second event associates to the confirmed track with its covariance
    assert "track #1*:" in captured and "sigma=" in captured


def test_doa_music_method(capsys):
    cli.main(["doa", "--azimuth", "137", "--method", "music",
              "--snapshots", "8"])
    captured = capsys.readouterr().out
    assert "MUSIC estimate" in captured
    import re

    got = float(re.search(r"MUSIC estimate:\s+([0-9.]+)", captured).group(1))
    assert abs(got - 137.0) < 4.0, got


def test_evaluate_manifest(tmp_path, capsys):
    import json

    import numpy as np

    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.utils import io as audio_io
    from audio_triangulation_tpu.utils import synth

    mics = geometry.reference_array()
    entries = []
    for i, (x, y) in enumerate([(0.6, 0.5), (-0.4, 0.7)]):
        rng = np.random.default_rng(10 + i)
        p = np.array([x, y, 1.2])
        src = p * (1.2 / np.linalg.norm(p))
        fr = synth.synth_scene(src, mics, seed=10 + i)[0]
        streams = rng.integers(127, 130, size=(3, 10000)).astype(np.float64)
        streams[:, 4000:5024] += 110.0 * fr
        wav = str(tmp_path / f"scene{i}.wav")
        audio_io.write_wav(
            wav, np.clip(np.round(streams), 0, 255).astype(np.int16),
            50_000)
        entries.append({"wav": wav, "x": x, "y": y})
    manifest = str(tmp_path / "manifest.json")
    with open(manifest, "w") as f:
        json.dump(entries, f)

    report = str(tmp_path / "report.json")
    cli.main(["evaluate", manifest, "--out", report])
    out = capsys.readouterr().out
    assert '"summary"' in out
    with open(report) as f:
        rep = json.load(f)
    assert rep["summary"]["files"] == 2
    assert rep["summary"]["detection_rate"] == 1.0
    assert rep["summary"]["xy_err_median_cm"] < 15.0
    assert all(r["detected"] for r in rep["rows"])


def test_stream_extract_writes_wav(tmp_path, capsys):
    """stream --extract: the continuous virtual-microphone WAV output."""
    out = str(tmp_path / "vmic.wav")
    cli.main(["stream", "--duration-samples", "16000", "--chunk", "512",
              "--extract", out])
    captured = capsys.readouterr().out
    assert "extracted" in captured
    from audio_triangulation_tpu.utils import io as audio_io

    samples, rate = audio_io.read_wav(out)
    assert rate == 50_000
    assert samples.shape[0] == 1
    # latency-trimmed: the whole chunks processed minus the WOLA latency
    assert samples.shape[1] == (16000 // 512) * 512 - 256
    assert np.max(np.abs(samples)) > 1000  # non-silent, scaled near peak


def test_stream_extract_odd_chunk_derives_hop(tmp_path, capsys):
    """--chunk 640 has no 256 divisor; the CLI derives hop=128 (COLA-safe)
    instead of crashing mid-run (review finding)."""
    out = str(tmp_path / "vmic640.wav")
    cli.main(["stream", "--duration-samples", "12800", "--chunk", "640",
              "--extract", out])
    assert "extracted" in capsys.readouterr().out


def test_stream_extract_rejects_live_mode():
    import pytest

    with pytest.raises(SystemExit, match="not supported with --source"):
        cli.main(["stream", "--source", "fifo:///tmp/nonexistent.fifo",
                  "--extract", "/tmp/x.wav"])


def test_simulate_volume(tmp_path, capsys):
    """simulate --volume: 3-D estimate near truth + top/side view PNG."""
    out = str(tmp_path / "vol.png")
    cli.main(["simulate", "--volume", "--array", "tetra",
              "--x", "0.5", "--y", "-0.3", "--height", "1.4",
              "--phat", "--band", "700:7000", "--out", out])
    text = capsys.readouterr().out
    assert "estimate: (" in text and "volume view ->" in text
    est = [float(v) for v in
           text.split("estimate: (")[1].split(")")[0].split(",")]
    assert abs(est[0] - 0.5) < 0.15 and abs(est[1] + 0.3) < 0.15
    assert abs(est[2] - 1.4) < 0.25
    import os

    assert os.path.getsize(out) > 500


def test_localize_wav_volume(tmp_path, capsys):
    """localize-wav --volume prints per-event xyz."""
    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.utils import io as audio_io
    from audio_triangulation_tpu.utils import synth

    mics = geometry.tetrahedral_array(0.3)
    rng = np.random.default_rng(5)
    src = np.array([0.4, 0.3, 1.2])
    fr = synth.synth_scene(src, mics, seed=5)[0]
    streams = rng.integers(127, 130, size=(4, 10000)).astype(np.float64)
    streams[:, 4000:5024] += 110.0 * fr
    wav = str(tmp_path / "scene3d.wav")
    audio_io.write_wav(
        wav, np.clip(np.round(streams), 0, 255).astype(np.int16), 50_000)

    cli.main(["localize-wav", wav, "--array", "tetra", "--volume",
              "--phat", "--band", "700:7000"])
    out = capsys.readouterr().out
    assert "xyz=(" in out
    est = [float(v) for v in out.split("xyz=(")[1].split(")")[0].split(",")]
    assert abs(est[0] - 0.4) < 0.2 and abs(est[1] - 0.3) < 0.2
    assert abs(est[2] - 1.2) < 0.35
