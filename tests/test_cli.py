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
