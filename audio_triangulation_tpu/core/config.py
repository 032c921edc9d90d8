"""Configuration pytrees for the TPU audio-triangulation framework.

Every knob that is a compile-time ``#define`` in the reference firmware is a field
here, with the reference's default value:

- sampling / physics constants: reference ``src/components/constants.h:10-19``
- frame size: reference ``src/components/buffer.h:5-6``
- detection threshold: reference ``src/sample_compute.h:21``
- correlogram smoothing / taper: reference ``src/components/correlations.c:26-49``
- heatmap grid geometry: reference ``src/components/vga/vga.h:27-35``

Configs are frozen dataclasses so they hash and can be closed over by ``jax.jit``
as static values.  Anything array-valued (mic positions, window tables, steering
LUTs) lives in :mod:`audio_triangulation_tpu.models` parameter pytrees instead.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Signal-chain configuration (windowing, correlation, smoothing).

    Defaults reproduce the reference firmware's behavior exactly (for the
    integer validation path) or up to float tolerance (float path).
    """

    # --- sampling / physics (constants.h:10-14) ---
    sample_rate_hz: int = 50_000
    speed_of_sound_mps: float = 343.0

    # --- frame geometry (buffer.h:5-6) ---
    frame_size_bits: int = 10  # frame = 1 << frame_size_bits samples

    # --- correlation search (constants.h:12) ---
    # None -> reference formula: sample_rate * 32 // 34300  (== 46 @ 50 kHz)
    max_shift_samples: Optional[int] = None

    # --- event detection (sample_compute.h:21, :124-134) ---
    # None -> reference formula: 2 << (2 * (frame_size_bits - 1))
    power_threshold: Optional[int] = None
    shift_gate: int = 4  # accept event iff sum of squared best shifts > this
    # 'absolute': the reference rule out > threshold + inc (ratio ignored).
    # 'relative': CFAR-style out > threshold + trigger_ratio * inc — the
    # incoming half-window IS the local noise-floor estimate, so detection
    # adapts when the floor varies (the fixed reference threshold either
    # false-triggers or goes deaf there).  JAX detector paths only; the
    # native ingest runtime takes its own trigger_ratio parameter.
    trigger_mode: str = "absolute"
    trigger_ratio: float = 4.0

    # --- conditioning (buffer.c:4-49) ---
    # 'shift8'     : the live reference behavior (fixed <<8 gain, buffer.c:15-18)
    # 'full_range' : the reference's dead peak-normalization code, done properly
    # 'none'       : raw
    normalize_mode: str = "shift8"
    window_nw: float = 2.0  # DPSS time-halfbandwidth (window.ipynb cell 2)
    window_enabled: bool = True
    # 'direct'  : dpss(frame_size) -- mathematically correct at any size
    # 'strided' : stride the fixed 1024-entry table the way buffer.c:8 does
    #             (firmware-exact for frame_size < 1024; identical at 1024)
    window_mode: str = "direct"

    # --- correlation engine ---
    # 'mxu'  : GCC as MXU matmuls (DFT + 93-lag synthesis; fastest on TPU)
    # 'fft'  : GCC via XLA rFFT/irFFT (reference implementation of the math)
    # 'time' : direct lag-domain correlation (matches reference math in float)
    xcorr_mode: str = "mxu"
    # matmul precision for the 'mxu' engine: 'float32' or 'bfloat16'
    # (bf16 runs the DFT at 2x MXU rate with f32 accumulation)
    matmul_dtype: str = "float32"
    # fused single-VMEM-pass Pallas GCC kernel (ops/pallas/gcc_kernel.py):
    # 'auto' uses it on TPU when shapes fit VMEM; 'on'/'off' force it
    fused_kernel: str = "auto"
    fused_tile_b: int = 64
    # in-kernel SRP scoring + grid argmax (gcc_kernel Mode B): measured
    # SLOWER than the external XLA scoring fusion on v5e-lite (the 6
    # per-pair [tile, 128] matmuls reach ~37 TFLOPS inside Mosaic vs ~130
    # for the one [B, 558] fusion; r3 trace: device 3.12 vs 2.95 ms/iter),
    # so 'off' by default; the mechanism is kept (tested bit-for-bit via
    # the compact row) for chips/shapes where the boundary copies dominate
    fused_srp: str = "off"  # 'on' | 'off'
    # HBM budget for precomputing the large-array SRP steering matrix
    # ([P*L8, G], bf16): when it fits, scoring is ONE MXU contraction
    # instead of the blocked scan that rebuilds per-chunk one-hots every
    # step (r3 config-5b trace: construction cost ~5x the matmul).
    # 0 disables the big-matmul path.
    srp_big_matmul_budget_bytes: int = 1024 * 1024 * 1024
    # software-pipeline depth inside the fused kernel: the batch tile is
    # split into this many sub-tiles with the next sub-tile's MXU DFT issued
    # ahead of the current one's VPU cross-power, so Mosaic can overlap the
    # two units (1 = no pipelining; must divide fused_tile_b)
    fused_sub_tiles: int = 1
    # SRP scoring matmul precision: the one-hot steering matrix is exact in
    # bfloat16, so 'bfloat16' halves the scoring cost at ~4e-3 relative score
    # error (argmax cell unchanged in tests; the GN solve refines regardless)
    srp_dtype: str = "float32"
    # block the pair axis of the GCC cross-power when P is large (e.g. 2016
    # pairs for 64 mics would need tens of GB unblocked); None -> auto
    pair_chunk: Optional[int] = None
    # PHAT whitening of the cross-power spectrum (new capability; reference has
    # no whitening -- set False for reference parity).
    phat: bool = False
    phat_eps: float = 1e-12
    # Generalized cross-correlation weighting (Knapp & Carter 1976).
    # 'auto' derives from ``phat`` ('phat' when set, else 'none'); the other
    # values select a frequency-weighting of the cross-spectrum:
    #   'scot' : 1/sqrt(Gaa Gbb)      (Smoothed Coherence Transform)
    #   'roth' : 1/Gaa                (Roth impulse-response weighting)
    #   'ml'   : |g|^2/(|Gab|(1-|g|^2)), g^2 = coherence (Hannan-Thomson /
    #            approximate maximum-likelihood; emphasizes coherent bins)
    # scot/roth/ml estimate Gaa/Gbb/Gab by a moving average over
    # ``2*coherence_bins + 1`` frequency bins (per-frame periodograms make
    # SCOT == PHAT and coherence == 1 exactly; smoothing is what gives
    # these weightings their distinct behavior).  These run on the XLA-FFT
    # correlation path (robustness-oriented, not the fused hot path).
    weighting: str = "auto"
    coherence_bins: int = 16
    # Partial PHAT: whiten by |X|^-beta (1.0 = full PHAT, the hot path's
    # rsqrt form).  beta < 1 keeps some magnitude weighting — more robust
    # when the source is band-limited (out-of-band bins stay down-weighted
    # instead of being equalized up to the signal's level).
    phat_beta: float = 1.0
    # (lo_hz, hi_hz): band-limit the cross-power before lag synthesis.
    # Folded into the lag-synthesis matrices on the MXU and fused-Pallas
    # paths (zero runtime cost); fixes PHAT's classic failure on
    # band-limited sources (whitened out-of-band noise swamping the peak).
    # None = full band.  The string 'auto' selects the band PER EVENT from
    # the data itself: rfft bins whose pair-averaged smoothed magnitude-
    # squared coherence clears a relative threshold (ops/xcorr.
    # auto_band_weight) weight the cross-power before lag synthesis — the
    # hands-free form of the static band (no constant to hand-match to the
    # source).  Since r5 'auto' runs IN-KERNEL on the fused Pallas path
    # (gcc_kernel spectral-stats mode) and folds into the spectra
    # (sqrt(w) scaling) on the unfused MXU / large-array paths; only the
    # explicit 'fft' engine routes it to the XLA-FFT reference path.
    band_hz: Optional[tuple] = None
    # 'auto' band selection knobs: a bin is in-band when its pair-mean
    # smoothed coherence >= max(rel * peak coherence, floor); if fewer than
    # min_bins qualify the event falls back to the full band (a flat-
    # coherence frame carries no band information).
    auto_band_rel: float = 0.5
    auto_band_floor: float = 0.15
    auto_band_min_bins: int = 8
    # Band-crop fast path: with band_hz set, compute ONLY the in-band rfft
    # bins (cropped DFT/synthesis matrices) instead of masking after the
    # fact — identical correlograms, ~bandwidth-fraction of the spectral
    # FLOPs/VMEM (e.g. 800-6000 Hz of a 25 kHz Nyquist: ~5x less).
    # MXU/fused paths only.
    band_crop: bool = False
    # Matmul precision of the DFT / lag-synthesis contractions.  TPU's
    # 'default' runs f32 matmuls via fast bf16-class passes — fine for the
    # strong in-band bins, but whitening amplifies the rounding on weak
    # bins (measured 0.13-sample TDOA error vs float64 truth on ADC-scale
    # frames with full-band PHAT; 1.9e-6 at 'highest').  'highest' trades
    # MXU throughput for exact-f32 contractions (accuracy-critical runs).
    dft_precision: str = "default"
    # 'linear'  : zero-padded FFT -> exact linear correlation (= reference's
    #             overlap-only sum, correlations.c:9-18)
    # 'circular': N-point circular correlation (cheaper; valid with windowing)
    fft_pad_mode: str = "linear"
    fft_size: Optional[int] = None  # None -> derived from pad mode

    # --- peak post-processing (correlations.c:20-33) ---
    taper_enabled: bool = True
    taper_denom: float = 36.0  # exp(-(s - s_best)^2 / taper_denom)
    subsample_peak: bool = True  # sub-sample interpolation (new capability)
    # 'parabolic': 3-point interpolation of the correlogram peak (hot path,
    #              folded into the fused kernel)
    # 'phase'    : coherence-weighted cross-spectrum phase-slope regression
    #              (ops/xcorr.tdoa_phase_slope) — lower bias for band-limited
    #              signals.  Since r5 it runs IN-KERNEL on the fused Pallas
    #              batch path (gcc_kernel.phase_slope_tdoa, ~2.3x the plain
    #              kernel's cost); small batches and the streaming event
    #              path use the XLA implementation.
    # 'hybrid'   : per-pair dispatch between the two — phase-slope where the
    #              pair's in-band mean coherence clears
    #              ``hybrid_coherence_min`` (phase wins there, ~30% at high
    #              SNR), parabolic elsewhere (both are noise-limited at low
    #              coherence and parabolic is cheaper/bias-free).  Same
    #              cost/path implications as 'phase'.
    subsample_method: str = "parabolic"
    # coherence gate of the 'hybrid' dispatch (in-band pair-mean smoothed
    # magnitude-squared coherence above which phase-slope is used)
    hybrid_coherence_min: float = 0.5

    # --- temporal smoothing (correlations.c:38-49) ---
    ema_tau_s: float = 0.5

    # --- numerics ---
    dtype: str = "float32"  # compute dtype of the float path
    # replace non-finite input samples with zeros before processing (failure
    # containment for production ingest; the reference's analogue is its
    # per-capture ring re-zeroing, sample_compute.h:55-57)
    nan_guard: bool = False

    # ------------------------------------------------------------------
    @property
    def frame_size(self) -> int:
        return 1 << self.frame_size_bits

    @property
    def max_shift(self) -> int:
        if self.max_shift_samples is not None:
            return self.max_shift_samples
        # constants.h:12 -- SAMPLE_RATE_HZ * 32 / 34300 (integer division)
        return self.sample_rate_hz * 32 // 34300

    @property
    def num_lags(self) -> int:
        return 2 * self.max_shift + 1

    @property
    def detect_threshold(self) -> int:
        if self.power_threshold is not None:
            return self.power_threshold
        # sample_compute.h:21 -- 2 << (2 * BUFFER_HALF_SIZE_BITS)
        return 2 << (2 * (self.frame_size_bits - 1))

    @property
    def band_auto(self) -> bool:
        """True when per-event data-driven band selection is configured."""
        return isinstance(self.band_hz, str)

    @property
    def effective_weighting(self) -> str:
        """The resolved GCC weighting: 'auto' maps to 'phat' iff ``phat``."""
        if self.weighting == "auto":
            return "phat" if self.phat else "none"
        return self.weighting

    @property
    def fft_length(self) -> int:
        if self.fft_size is not None:
            return self.fft_size
        if self.fft_pad_mode == "circular":
            return self.frame_size
        # linear correlation needs length >= N + max_shift; round to pow2 so
        # the TPU FFT stays on its fast path.
        return _next_pow2(self.frame_size + self.max_shift)

    def __post_init__(self):
        _check = {
            "normalize_mode": ("shift8", "full_range", "none"),
            "xcorr_mode": ("mxu", "fft", "time"),
            "matmul_dtype": ("float32", "bfloat16"),
            "fused_kernel": ("auto", "on", "off"),
            "fused_srp": ("on", "off"),
            "srp_dtype": ("float32", "bfloat16"),
            "fft_pad_mode": ("linear", "circular"),
            "weighting": ("auto", "none", "phat", "scot", "roth", "ml"),
            "subsample_method": ("parabolic", "phase", "hybrid"),
            "dft_precision": ("default", "highest"),
        }
        for field, allowed in _check.items():
            v = getattr(self, field)
            if v not in allowed:
                raise ValueError(
                    f"{field}={v!r} not in {allowed}")
        if not 0.0 < self.phat_beta <= 1.0:
            raise ValueError(f"phat_beta={self.phat_beta} not in (0, 1]")
        if isinstance(self.band_hz, str):
            if self.band_hz != "auto":
                raise ValueError(
                    f"band_hz={self.band_hz!r}: the only string value is "
                    "'auto' (else pass a (lo_hz, hi_hz) tuple or None)")
            if self.band_crop:
                raise ValueError(
                    "band_crop needs a static (lo, hi) band known at "
                    "compile time; band_hz='auto' selects bins per event")
            if not 0.0 < self.auto_band_rel <= 1.0:
                raise ValueError(
                    f"auto_band_rel={self.auto_band_rel} not in (0, 1]")
            if not 0.0 <= self.auto_band_floor < 1.0:
                raise ValueError(
                    f"auto_band_floor={self.auto_band_floor} not in [0, 1)")
        elif self.band_hz is not None:
            lo, hi = self.band_hz
            if not 0.0 <= lo < hi <= self.sample_rate_hz / 2:
                raise ValueError(
                    f"band_hz={self.band_hz} must satisfy "
                    f"0 <= lo < hi <= nyquist")
        if self.band_hz is not None and self.xcorr_mode == "time":
            raise ValueError(
                "band_hz is a spectral-domain control; the time-domain "
                "correlator (xcorr_mode='time') cannot honor it")
        if self.band_crop and self.band_hz is None:
            raise ValueError("band_crop requires band_hz")
        if not 0.0 <= self.hybrid_coherence_min <= 1.0:
            raise ValueError(
                f"hybrid_coherence_min={self.hybrid_coherence_min} "
                "not in [0, 1]")
        if self.dft_precision == "highest" and self.matmul_dtype != "float32":
            raise ValueError(
                "dft_precision='highest' requires matmul_dtype='float32' "
                "(bf16 inputs would be quantized before the exact matmul)")
        # Normalize the phat flag against an explicit weighting choice ONCE,
        # so every engine (xcorr_fft keys on effective_weighting; the
        # MXU/fused/gcc_large paths key on cfg.phat) sees the same decision:
        # weighting='phat' turns whitening on, any other explicit weighting
        # turns the phat flag off ('auto' keeps it).
        if self.weighting == "phat" and not self.phat:
            object.__setattr__(self, "phat", True)
        elif self.weighting not in ("auto", "phat") and self.phat:
            object.__setattr__(self, "phat", False)

    def lag_axis(self):
        """Integer lags [-max_shift .. max_shift] as a Python range."""
        return range(-self.max_shift, self.max_shift + 1)


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """SRP localization grid (reference vga.h:27-35, vga_heatmap.h:48-93).

    The reference evaluates a (2*half_cells+1)^2 planar grid, projects each
    cell onto a sphere of radius ``height_m`` centered on the array (so all
    candidate points are equidistant from the array center), and scores cells
    by summing correlogram values at each cell's expected integer lags.
    """

    half_cells_x: int = 50  # POS_HALF_W
    half_cells_y: int = 50  # POS_HALF_H
    cells_per_m: float = 24.0  # POS_SCALE (reference: pixels-per-meter / cell)
    height_m: float = 1.2  # EXPECTED_HEIGHT_OFFSET
    # 'sphere' : project every cell onto the radius-height_m sphere (reference)
    # 'plane'  : keep cells on the z = height_m plane (new capability)
    projection: str = "sphere"
    # quadratic sub-cell refinement of the grid peak; 'auto' skips it when
    # the Gauss-Newton solver runs (which supersedes it) — the refinement's
    # six neighbor lookups cost real time at large batch
    refine_peak: str = "auto"  # 'auto' | 'on' | 'off'

    def __post_init__(self):
        if self.projection not in ("sphere", "plane"):
            raise ValueError(f"projection={self.projection!r}")
        if self.refine_peak not in ("auto", "on", "off"):
            raise ValueError(f"refine_peak={self.refine_peak!r}")

    @property
    def width(self) -> int:
        return 2 * self.half_cells_x + 1

    @property
    def height(self) -> int:
        return 2 * self.half_cells_y + 1

    @property
    def num_cells(self) -> int:
        return self.width * self.height


@dataclasses.dataclass(frozen=True)
class VolumeConfig:
    """Volumetric (3-D) SRP localization grid (new capability; the
    reference's grid is the fixed-height 2-D cap of GridConfig —
    vga.h:27-35).  A box of (2*half_x+1) x (2*half_y+1) x z_cells
    candidate points: x/y centered on the array like GridConfig,
    z spanning [z_min_m, z_max_m] inclusive."""

    half_cells_x: int = 20
    half_cells_y: int = 20
    cells_per_m: float = 10.0
    z_min_m: float = 0.2
    z_max_m: float = 2.2
    z_cells: int = 21

    def __post_init__(self):
        if self.z_cells < 1:
            raise ValueError("z_cells must be >= 1")
        if self.z_max_m < self.z_min_m:
            raise ValueError("z_max_m < z_min_m")

    @property
    def width(self) -> int:
        return 2 * self.half_cells_x + 1

    @property
    def height(self) -> int:
        return 2 * self.half_cells_y + 1

    @property
    def depth(self) -> int:
        return self.z_cells

    @property
    def num_cells(self) -> int:
        return self.width * self.height * self.depth

    @property
    def z_step_m(self) -> float:
        if self.z_cells == 1:
            return 0.0
        return (self.z_max_m - self.z_min_m) / (self.z_cells - 1)


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Closed-form / iterative TDOA solver (new capability; the reference's
    only solver is the grid search itself)."""

    iterations: int = 5  # Gauss-Newton steps (quadratic convergence from a
    # grid-cell-accurate init; 3-4 suffice, 5 adds margin)
    damping: float = 1e-3  # Levenberg damping
    constrain_to_sphere: bool = True  # match the reference's sphere-cap model
    # --- robust (outlier-resistant) estimation ---
    # 'huber' / 'cauchy' run IRLS rounds after the plain GN solve: pairs are
    # reweighted by their TDOA residuals so multipath / spurious-peak pairs
    # stop dragging the fit (M-estimation).  'none' = plain least squares.
    robust: str = "none"
    robust_scale_m: float = 0.0  # residual scale (m); 0 = adaptive 1.4826*MAD
    irls_iterations: int = 2  # reweight rounds (each re-runs the GN loop)


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    """Streaming ingest / event-detection configuration
    (reference sample_compute.h:45-150, rolling_buffer.c).

    The streaming step extracts up to ``max_events_per_chunk`` triggers per
    chunk (masked, statically unrolled), each followed by the reference's
    full-frame refill holdoff (sample_compute.h:55-57 re-inits the rings)
    plus ``refractory_samples``.  With chunk_size < frame_size the default
    of 1 loses nothing — the refill outlasts the chunk; raise it when
    chunk_size spans multiple frame refills."""

    chunk_size: int = 256  # samples consumed per stream step
    max_events_per_chunk: int = 1  # events extracted per step (masked)
    refractory_samples: int = 0  # extra post-trigger holdoff
    # > 1 resolves simultaneous sources per event (SRP top-K on the RAW
    # per-event correlograms + per-source GN refine; see
    # models.localizer.localize_frames_multi) into 'multi_*' outputs
    n_sources: int = 1
    multi_min_separation_m: float = 0.4  # top-K NMS suppression radius
    multi_assoc_window_samples: float = 3.0  # TDOA re-measurement gate
    # step_many sub-batch size: beyond ~1,024 streams the detector ring
    # state ([S, M, ring] f32) outgrows XLA's alternate-memory (VMEM)
    # budget and the whole batched program spills to HBM with relayout
    # copies (r3 trace: 2,048 dense streams cost 15.7 ms device vs 2x2.94
    # chunked — a 2.7x superlinear cliff).  step_many therefore issues
    # asynchronously pipelined DISPATCHES of one compiled sub-batch
    # program of this size (a lax.map body re-spills — see step_many's
    # docstring).  Dispatch-level pipelining needs host control, so under
    # an enclosing jit step_many detects the trace and deliberately falls
    # back to the single vmapped program.  None disables chunking
    # (single vmapped program at any size).
    batch_chunk_streams: Optional[int] = 1024
    # free-(x, y, z) solve of each step's smoothed TDOAs (with_solver
    # path): multi-start GN over ``xyz_z_inits`` heights (no volumetric
    # grid in the loop — ops.solver.solve_tdoa_xyz_multistart), adding
    # 'xyz' / 'xyz_rms_m' outputs.  Wants a non-coplanar array
    # (geometry.tetrahedral_array); pair with a dim=3 tracker.
    solve_xyz: bool = False
    xyz_z_inits: tuple = (0.4, 1.2, 2.0)
    # per-event instantaneous velocity via the delay-Doppler CAF on the
    # captured frame (ops.caf; with_solver path): adds 'velocity' (in-plane
    # [2] for planar arrays, [3] for non-coplanar) and 'pair_rel_speed'
    # outputs sized for Tracker.step(z_vel=...).  Opt-in: costs
    # ~velocity_n_scales x one frame's GCC every step.
    solve_velocity: bool = False
    velocity_v_max: float = 8.0
    velocity_n_scales: int = 33
    # fault-tolerant live solve: convert the per-mic TDOA cycle-consistency
    # scores the step already reports (ops/consistency) into per-pair
    # weights applied to the SRP scoring and the GN solve, so a failing
    # channel's pairs stop dragging the fit while a healthy array is left
    # (relatively) unweighted.  Needs pair redundancy to matter: with
    # M >= 5 mics a single dead channel is fully absorbed.  health_ratio
    # is the Cauchy scale in units of the median mic score; health_floor_s
    # bounds that scale from below (seconds — 1e-5 s = 0.5 sample @ 50 kHz,
    # the EMA peak wander of a healthy array) so a near-perfect array
    # never amplifies numerical noise.
    health_weighting: bool = False
    health_ratio: float = 3.0
    health_floor_s: float = 1e-5


@dataclasses.dataclass(frozen=True)
class ShardingConfig:
    """Multi-chip execution layout (no reference equivalent: the firmware's
    dual-core FIFO scaffolding, pt_cornell_rp2040_v1_3.h:629-682, is unused)."""

    data_axis: str = "data"  # frames/batch axis
    model_axis: str = "model"  # SRP grid / pair axis
    mesh_shape: Optional[Tuple[int, ...]] = None  # None -> all devices on data


# Reference mic geometry (constants.h:17-19, :26-28)
REFERENCE_DISTANCES = (0.132, 0.15, 0.20)  # AB, BC, CA in meters
REFERENCE_MIRROR = True
REFERENCE_ROTATE = False
