"""The examples must keep running (they are documentation).

All five examples run in ONE subprocess (each exec'd in a fresh module
namespace, outputs split on sentinel lines): a separate interpreter per
example paid ~7 s of JAX import x5 plus cold in-process jit caches, ~30 s
of the suite for no extra coverage.  Failures stay attributable — the
driver tags each example's traceback with its name and keeps going so one
broken example doesn't mask the others."""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = ("quickstart.py", "advanced.py", "production.py",
            "robustness.py", "serving_http.py")

_DRIVER = r"""
import io, os, sys, traceback
import jax
jax.config.update('jax_platforms', 'cpu')
if os.environ.get('JAX_COMPILATION_CACHE_DIR'):
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
names = sys.argv[1:]
for name in names:
    print(f'===EXAMPLE:{name}===', flush=True)
    path = os.path.join(os.environ['ATRT_EXAMPLES_DIR'], name)
    try:
        code = compile(open(path).read(), path, 'exec')
        exec(code, {'__name__': '__main__', '__file__': path})
    except BaseException:
        print(f'===EXAMPLE-FAILED:{name}===', flush=True)
        traceback.print_exc()
        sys.stdout.flush()
print('===EXAMPLES-DONE===', flush=True)
"""


@pytest.fixture(scope="module")
def example_outputs():
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/atrt-jax-test-cache")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               ATRT_EXAMPLES_DIR=os.path.join(ROOT, "examples"))
    if cache:
        env["JAX_COMPILATION_CACHE_DIR"] = cache
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER, *EXAMPLES], capture_output=True,
        text=True, cwd=ROOT, env=env, timeout=1200)
    assert "===EXAMPLES-DONE===" in out.stdout, (
        out.stdout[-1000:] + out.stderr[-2000:])
    outputs = {}
    for chunk in out.stdout.split("===EXAMPLE:")[1:]:
        name, _, body = chunk.partition("===\n")
        outputs[name] = body
    outputs["__stderr__"] = out.stderr
    return outputs


def _get(outputs, name):
    body = outputs[name]
    assert f"===EXAMPLE-FAILED:{name}===" not in body, (
        body[-1000:] + outputs["__stderr__"][-2000:])
    return body


def test_quickstart_example(example_outputs):
    out = _get(example_outputs, "quickstart.py")
    assert "estimated" in out and "calibration" in out


def test_advanced_example(example_outputs):
    out = _get(example_outputs, "advanced.py")
    assert "DoA" in out and "3-D" in out and "multi-source" in out
    assert "registration:" in out
    assert "dereverb: WPE cut the reverberant tail" in out
    assert "IMM tracking: p(maneuver)" in out


def test_production_example(example_outputs):
    out = _get(example_outputs, "production.py")
    assert "transport:" in out and "1 event(s)" in out
    assert "streaming: 2 events" in out
    assert "tracking: confirmed track" in out
    assert "health: faulty mics [5]" in out
    assert "extraction: virtual mic SNR" in out
    assert "fused tracking:" in out and "one dispatch per chunk" in out


def test_robustness_example(example_outputs):
    out = _get(example_outputs, "robustness.py")
    assert "robustness tour done" in out
    assert "huber" in out
    assert "band 'auto'" in out and "auto-band + hybrid" in out


def test_serving_http_example(example_outputs):
    out = _get(example_outputs, "serving_http.py")
    assert "serving tour done" in out
    assert "POST /localize" in out
    assert "stream event" in out
