#!/usr/bin/env python3
"""Generate the committed evaluation dataset (tests/data/eval/).

~20 labeled 3-channel WAV scenes for the `evaluate` CLI: anechoic and
reverberant (image-source shoebox rooms at several RT60s), at several
SNRs, sources spread over the plane.  Everything is deterministic
(fixed seeds), 16-bit, and small (<2 MB total) so the dataset lives in
git and accuracy regressions fail CI without any synthesis-drift blind
spot (the previous evaluate test synthesized its WAVs at test time, so
a drift in synthesis and evaluation together went unseen).

Regenerate with: python tools/make_eval_dataset.py
(The test asserts on the committed files, not on regeneration.)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                       "eval")
FS = 50_000
STREAM_LEN = 12_000
BURST_AT = 4_000


def main():
    from audio_triangulation_tpu.core import geometry
    from audio_triangulation_tpu.utils import io as audio_io
    from audio_triangulation_tpu.utils import room as room_mod
    from audio_triangulation_tpu.utils import synth

    mics = geometry.reference_array()
    os.makedirs(OUT_DIR, exist_ok=True)

    # (x, y) plane labels; the 3-D source sits on the 1.2 m sphere through
    # (x, y, 1.2) — the grid/solver convention (vga_heatmap.h:57-60)
    positions = [
        (0.6, 0.5), (-0.4, 0.7), (0.8, -0.3), (-0.7, -0.6), (0.2, 0.9),
        (1.0, 0.1), (-0.9, 0.2), (0.3, -0.8), (-0.2, -0.2), (0.5, 0.0),
    ]
    # (kind, burst_gain, rt60_absorption, max_order).  Conditions are
    # chosen to be SOLVABLE by the default pipeline (floors catch
    # regressions); RT60 >~ 0.4 s at 20 ms frames is physically hopeless
    # for this 3-mic array and carries no regression signal.
    conditions = [
        ("anechoic_hi", 110.0, None, 0),    # ~high SNR (the CLI demo scale)
        ("anechoic_lo", 30.0, None, 0),     # low SNR: ~3.5 LSB noise floor
        ("reverb_light", 90.0, 0.6, 6),     # sparse early reflections
        ("reverb_mod", 90.0, 0.35, 8),      # RT60 ~0.33 s (Sabine)
    ]
    entries = []
    i = 0
    for kind, gain, absorption, max_order in conditions:
        for x, y in positions[:5]:
            rng = np.random.default_rng(1000 + i)
            p = np.array([x, y, 1.2])
            src = p * (1.2 / np.linalg.norm(p))
            if absorption is None:
                fr = synth.synth_scene(src, mics, noise_rms=0.0,
                                       seed=1000 + i)[0]
            else:
                room = room_mod.ShoeboxRoom(
                    size=(6.0, 5.0, 3.0), absorption=absorption,
                    max_order=max_order)
                shift = np.array([3.0, 2.5, 1.0])
                mics3 = np.zeros((mics.shape[0], 3))
                mics3[:, :2] = mics
                # n = frame length: tail energy past 20.5 ms wraps
                # circularly (deterministic diffuse noise — part of what
                # makes the reverb conditions hard)
                fr = room_mod.simulate(
                    src + shift, mics3 + shift, room, n=1024, fs=FS,
                    noise_rms=0.0, seed=1000 + i)[0]
                peak = np.max(np.abs(fr)) or 1.0
                fr = fr / peak * 0.9
            # ADC-scale stream: ~128 DC + ~1.5 LSB idle noise + gain*burst
            streams = rng.integers(127, 130,
                                   size=(3, STREAM_LEN)).astype(np.float64)
            streams[:, BURST_AT:BURST_AT + 1024] += gain * fr
            wav = f"scene_{i:02d}_{kind}.wav"
            audio_io.write_wav(
                os.path.join(OUT_DIR, wav),
                np.clip(np.round(streams), 0, 255).astype(np.int16), FS)
            entries.append({"wav": wav, "x": x, "y": y, "kind": kind})
            i += 1

    with open(os.path.join(OUT_DIR, "manifest.json"), "w") as f:
        json.dump(entries, f, indent=1)
    total = sum(
        os.path.getsize(os.path.join(OUT_DIR, e["wav"])) for e in entries)
    print(f"wrote {len(entries)} scenes, {total / 1e6:.2f} MB -> {OUT_DIR}")


if __name__ == "__main__":
    main()
