"""The examples must keep running (they are documentation)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name):
    # share the suite's persistent compilation cache (tests/conftest.py sets
    # it in-process only): the examples compile many near-identical
    # Localizers, so later examples hit entries written by earlier ones
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/atrt-jax-test-cache")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cache_cfg = ""
    if cache:
        env["JAX_COMPILATION_CACHE_DIR"] = cache
        cache_cfg = (
            "jax.config.update('jax_persistent_cache_min_compile_time_secs'"
            ", 0.5);"
        )
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        + cache_cfg
        + f"exec(open(r'{os.path.join(ROOT, 'examples', name)}').read())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=ROOT, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_quickstart_example():
    out = _run_example("quickstart.py")
    assert "estimated" in out and "calibration" in out


def test_advanced_example():
    out = _run_example("advanced.py")
    assert "DoA" in out and "3-D" in out and "multi-source" in out


def test_production_example():
    out = _run_example("production.py")
    assert "transport:" in out and "1 event(s)" in out
    assert "streaming: 2 events" in out
    assert "tracking: confirmed track" in out
    assert "health: faulty mics [5]" in out


def test_robustness_example():
    out = _run_example("robustness.py")
    assert "robustness tour done" in out
    assert "huber" in out


def test_serving_http_example():
    out = _run_example("serving_http.py")
    assert "serving tour done" in out
    assert "POST /localize" in out
    assert "stream event" in out
