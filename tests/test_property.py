"""Property-based tests (hypothesis): invariants that must hold for ANY
input, not just the fixtures."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from audio_triangulation_tpu.core.config import PipelineConfig
from audio_triangulation_tpu.core import geometry
from audio_triangulation_tpu.ops import conditioning, detector, xcorr
from audio_triangulation_tpu.utils import golden

CFG = PipelineConfig()
_SETTINGS = dict(max_examples=20, deadline=None)


@given(st.integers(min_value=0, max_value=2**32 - 1))
@settings(**_SETTINGS)
def test_int_conditioning_matches_golden_any_input(seed):
    rng = np.random.default_rng(seed)
    frame = rng.integers(0, 256, size=1024).astype(np.int16)
    total = int(frame.astype(np.int64).sum())
    offset = total >> 10
    ref = golden.normalize_shift8((frame.astype(np.int64) - offset)
                                  .astype(np.int16))
    ours = conditioning.normalize_shift8_int(
        conditioning.dc_remove_int(jnp.asarray(frame)[None], 10))[0]
    np.testing.assert_array_equal(np.asarray(ours), ref)


@given(st.integers(min_value=-46, max_value=46),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(**_SETTINGS)
def test_integer_delay_always_recovered(delay, seed):
    """Any integer delay in range is recovered exactly on a clean chirp."""
    from audio_triangulation_tpu.utils import synth

    sig = synth.chirp_burst(1024, 50_000.0)
    rng = np.random.default_rng(seed)
    sig = sig + rng.normal(0, 0.01, 1024)
    b = synth.fractional_delay(sig, np.float64(delay))
    frames = jnp.asarray(np.stack([sig, b])[None].astype(np.float32))
    corr = xcorr.xcorr_fft(frames, jnp.asarray([[0, 1]], jnp.int32), CFG)
    assert int(xcorr.best_lag(corr, CFG.max_shift)[0, 0]) == delay


@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(**_SETTINGS)
def test_detector_powers_nonnegative_and_match_golden(seed):
    """Detector powers are variance-like (>= 0) and bit-match the ring for
    arbitrary uint8 streams."""
    rng = np.random.default_rng(seed)
    stream = rng.integers(0, 256, size=1600).astype(np.int64)
    inc, out = detector.half_window_powers(jnp.asarray(stream)[None], 1024)
    inc, out = np.asarray(inc)[0], np.asarray(out)[0]
    rb = golden.RollingBuffer()
    for t in range(1600):
        rb.push(int(stream[t]))
        if rb.is_full:
            assert inc[t] == rb.get_incoming_power()
            assert out[t] == rb.get_outgoing_power()
            assert inc[t] >= 0 and out[t] >= 0


@given(st.integers(min_value=3, max_value=10))
@settings(max_examples=8, deadline=None)
def test_pair_count_formula(n_mics):
    pairs = geometry.mic_pairs(n_mics)
    assert pairs.shape == (n_mics * (n_mics - 1) // 2, 2)
    assert (pairs[:, 0] < pairs[:, 1]).all()


@given(st.floats(min_value=-1.4, max_value=1.4),
       st.floats(min_value=-1.4, max_value=1.4))
@settings(**_SETTINGS)
def test_lag_lut_within_range(x, y):
    """Every grid cell's LUT index is a valid correlogram index."""
    from audio_triangulation_tpu.core.config import GridConfig

    mics = geometry.triangle_from_distances(
        0.1 + abs(x) * 0.1, 0.12 + abs(y) * 0.1, 0.15)
    grid = GridConfig(half_cells_x=8, half_cells_y=8)
    lut = geometry.lag_lut(grid, mics, geometry.mic_pairs(3), CFG)
    assert lut.min() >= 0 and lut.max() <= 2 * CFG.max_shift
