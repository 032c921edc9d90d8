"""Fused GCC Pallas kernel: the whole per-frame hot chain in one VMEM pass.

The reference's per-event compute burst (``src/sample_compute.h:105-122``:
DC-remove -> gain -> window -> cross-correlate) maps here to a single Pallas
kernel over a tile of frames:

    frames tile [TB, M, N]  --(VMEM)-->
      DC-remove + gain + window            (VPU)
      Re/Im DFT = x @ cos / x @ -sin       (MXU, weights resident in VMEM)
      per-pair cross-power (+ PHAT)        (VPU)
      correlogram = Re @ synC + Im @ synS  (MXU)
    -> correlograms [TB, P, L_pad]

Unlike the unfused ops.mxu_fft path, the [B, M, F] spectra and [B, P, F]
cross-power never touch HBM — per frame only the 16 KB of PCM comes in and
~3 KB of correlogram goes out.  The DFT/synthesis matrices stay resident in
VMEM across the whole grid.

Falls back gracefully: tests run it with ``interpret=True`` on CPU; the
wrapper in ops.mxu_fft/models dispatches to it only when shapes fit VMEM.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.config import PipelineConfig
from .. import mxu_fft
from .. import xcorr as xcorr_ops


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _atan_poly(x):
    """atan for x >= 0 (Cephes atanf range reduction + degree-4-in-z
    minimax polynomial; ~1e-7 abs error in f32).  Mosaic has no atan/atan2
    primitive, so the kernel carries its own."""
    t3p8 = 2.414213562373095  # tan(3*pi/8)
    tp8 = 0.4142135623730950  # tan(pi/8)
    big = x > t3p8
    mid = (x > tp8) & ~big
    safe = jnp.maximum(x, 1e-30)
    xr = jnp.where(big, -1.0 / safe,
                   jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    y0 = jnp.where(big, jnp.float32(np.pi / 2),
                   jnp.where(mid, jnp.float32(np.pi / 4), jnp.float32(0.0)))
    z = xr * xr
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    return y0 + p * z * xr + xr


def _atan2(y, x):
    """Quadrant-correct atan2(y, x) from :func:`_atan_poly` (f32)."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    a = _atan_poly(ay / jnp.maximum(ax, 1e-30))
    a = jnp.where(x < 0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0, -a, a)


class _StatsCfg:
    """Static parameters of the in-kernel spectral-stats path (smoothed
    coherence -> per-event auto band weight and/or phase-slope sub-sample
    TDOA).  A plain attribute bag so the kernel closure stays hashable via
    functools.partial identity (constructed once per trace)."""

    def __init__(self, *, band_auto, auto_rel, auto_floor, auto_min_bins,
                 hw, f_full, fft_length, phase, hybrid, hybrid_min,
                 band_lanes):
        self.band_auto = band_auto      # per-event coherence band weight
        self.auto_rel = auto_rel
        self.auto_floor = auto_floor
        self.auto_min_bins = auto_min_bins
        self.hw = hw                    # coherence smoothing half-width
        self.f_full = f_full            # rfft bin count INCLUDING Nyquist
        self.fft_length = fft_length
        self.phase = phase              # phase-slope TDOA refinement
        self.hybrid = hybrid            # gate phase on in-band coherence
        self.hybrid_min = hybrid_min
        self.band_lanes = band_lanes    # static (lo, hi_excl) lane range
        #                                 for phase weights, or None


def _gcc_kernel(frames_ref, window_ref, cos_ref, msin_ref, sync_ref,
                syns_ref, out_ref, aux_ref, onehot_ref=None, cell_ref=None,
                *, pairs, phat, phat_eps, n, tile_b, n_mics, num_lags,
                taper_denom, with_peaks, nyq_fold, inv_fft_len, srp_g=0,
                compact=False, sub_tiles=1, mxu_precision=None,
                stats_cfg=None, smooth_ref=None):
    """One grid step: frames_ref [TB, M, N] -> out_ref [TB, P, L_pad]
    (tapered correlograms) and, when with_peaks, aux_ref [TB, P, L_pad]
    carrying lane 0 = integer best shift, lane 1 = sub-sample TDOA, lane 2 =
    peak value.

    With ``nyq_fold`` the DFT matrices carry only F-1 = fft_length/2 bins —
    a full 128-lane multiple, so Mosaic wastes no MXU columns / VPU lanes on
    padding (513 would pad to 640) — and the Nyquist bin is reconstructed
    exactly on the VPU: at f = L/2 the DFT row is cos(pi n) = (-1)^n with
    sin = 0, so Im X = 0, the pair cross-power is the real product, and the
    lag-synthesis row is cos(pi lag)/L = alternating +-1/L — a rank-1
    broadcast add.

    With ``sub_tiles`` > 1 the batch tile is processed as a software
    pipeline: sub-tile s+1's conditioning + DFT (MXU-heavy) is emitted
    before sub-tile s's cross-power / peak stages (VPU-heavy), giving the
    Mosaic scheduler adjacent independent chains for the two units to
    overlap.  Per-row math is identical to sub_tiles=1 (results equal to
    float tolerance; matmul shapes differ, so contraction order may)."""
    sb = tile_b // sub_tiles
    n_pairs = len(pairs)
    k_half = (num_lags - 1) // 2
    l_pad = sync_ref.shape[-1]
    # whiten per mic iff M >= 3 (ops.xcorr.phat_per_mic; 2-mic arrays have
    # P = 1 < M, so per-pair touches less data there)
    per_mic = phat and n_mics >= 3

    if nyq_fold:
        # Nyquist-bin helpers shared by all sub-tiles:
        # alternating time-domain row ((-1)^n) and the Nyquist lag-synthesis
        # row cos(pi (lane - K)) / L (Hermitian weight 1)
        alt_n = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % 2 == 0,
            jnp.float32(1.0), jnp.float32(-1.0))
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, l_pad), 1)
        alt_l = jnp.where((lane_i - k_half) % 2 == 0,
                          jnp.float32(inv_fft_len),
                          jnp.float32(-inv_fft_len))

    def stage_front(s):
        """Conditioning + DFT (+ whitening, Nyquist) for sub-tile s."""
        x = frames_ref[s * sb:(s + 1) * sb].astype(jnp.float32)
        x = x.reshape(sb * n_mics, n)
        # conditioning: DC removal + gain folded into the window vector
        mean = jnp.mean(x, axis=-1, keepdims=True)
        x = (x - mean) * window_ref[:]
        re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=mxu_precision)
        im = jnp.dot(x, msin_ref[:], preferred_element_type=jnp.float32,
                     precision=mxu_precision)
        if per_mic:
            # per-mic PHAT whitening (the pair weight 1/|X_i X_j*|
            # factorizes, see ops.xcorr.whiten_spectra): M rows of rsqrt
            # instead of P, and the per-pair stage is pure multiplies
            inv = jax.lax.rsqrt(re * re + im * im + phat_eps * phat_eps)
            re = re * inv
            im = im * inv
        re_nyq = None
        if nyq_fold:
            # Nyquist-bin Re via alternating sum (Im is exactly 0 there);
            # keep lane dim = 1 throughout (Mosaic can't cast lane widths)
            re_nyq = jnp.sum(x * alt_n, axis=-1, keepdims=True)  # [SB*M, 1]
            if per_mic:
                re_nyq = re_nyq * jax.lax.rsqrt(
                    re_nyq * re_nyq + phat_eps * phat_eps)
            re_nyq = re_nyq.reshape(sb, n_mics, 1)
        f = re.shape[-1]
        return (re.reshape(sb, n_mics, f), im.reshape(sb, n_mics, f), re_nyq)

    def stage_cross(front):
        """Per-pair cross-power (VPU) for one sub-tile."""
        re, im, re_nyq = front
        f = re.shape[-1]
        rrs, jjs, nyq_corrs = [], [], []
        for (i, j) in pairs:  # static unroll over the (small) pair list
            rr = re[:, i, :] * re[:, j, :] + im[:, i, :] * im[:, j, :]
            jj = re[:, i, :] * im[:, j, :] - im[:, i, :] * re[:, j, :]
            if phat and not per_mic:  # 2-mic: whiten the single pair
                inv = jax.lax.rsqrt(rr * rr + jj * jj + phat_eps * phat_eps)
                rr = rr * inv
                jj = jj * inv
            rrs.append(rr)
            jjs.append(jj)
            if nyq_fold:
                rrn = re_nyq[:, i, :] * re_nyq[:, j, :]  # [SB, 1]; Im == 0
                if phat and not per_mic:
                    rrn = rrn * jax.lax.rsqrt(
                        rrn * rrn + phat_eps * phat_eps)
                nyq_corrs.append(rrn * alt_l)  # [SB, l_pad]
        rr = jnp.stack(rrs, axis=1).reshape(sb * n_pairs, f)
        jj = jnp.stack(jjs, axis=1).reshape(sb * n_pairs, f)
        return rr, jj, nyq_corrs

    def stage_synth(rr, jj, nyq_corrs):
        """Lag synthesis (MXU) for one sub-tile."""
        corr = (jnp.dot(rr, sync_ref[:], preferred_element_type=jnp.float32,
                        precision=mxu_precision)
                + jnp.dot(jj, syns_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=mxu_precision))
        if nyq_fold and nyq_corrs:
            corr = corr + jnp.stack(nyq_corrs, axis=1).reshape(
                sb * n_pairs, l_pad)
        return corr

    def lanes_from_rows(col):
        """[SB*P, 1] per-(frame,pair) column -> [SB, P] lanes (Mosaic's
        native sublane->lane relayout)."""
        return col.reshape(sb, n_pairs)

    # ---- spectral-stats mode (band_hz='auto' and/or phase/hybrid) -------
    # The unfused analogue is ops.xcorr: freq_smooth -> smoothed_cross_stats
    # -> auto_band_weight / tdoa_phase_slope.  Everything runs on the
    # VMEM-resident spectra the kernel already has — the reason this mode
    # exists (r4 verdict: the unfused fallback's HBM-resident [B, M, F] /
    # [B, P, F] intermediates cost 36x and OOM at headline batch).
    sc = stats_cfg

    def _smooth(x, nyq_col=None):
        """Moving average over +-hw bins with edge support counted over
        the FULL rfft bin set (= ops.xcorr.freq_smooth): x [R, F_k] holds
        bins 0..F_full-2 (Nyquist folded out); ``nyq_col`` [R, 1] is the
        Nyquist bin's value, folded back into the windows that cover it.

        Computed as ONE MXU matmul against the banded smoothing matrix
        (smooth_ref rows [0:F_k]; the final row is the Nyquist-correction
        row, with 1/count folded into every entry).  The roll-based VPU
        form this replaced cost ~64 serialized lane-shift ops per tensor
        — 3.5x the whole base kernel (measured r5: auto_parabolic 0.84M
        vs fullband 2.97M frames/s at 8192x4).  HIGHEST precision: the
        smoothed estimates feed a threshold, and bf16-class passes would
        wiggle coherence by ~1% near it."""
        total = jnp.dot(x, smooth_ref[: x.shape[-1]],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        if nyq_col is not None:
            total = total + nyq_col * smooth_ref[x.shape[-1]:]
        return total

    def _expand_rows(w2):
        """[SB, F] -> [SB*P, F] with each frame's row repeated per pair,
        matching the (frame-major, pair-minor) row order of the stacked
        cross tensors.  Static-unrolled stack — NOT pltpu.repeat, whose
        semantics are tile-wise ([r0 r1 r0 r1], the wrong row mapping)."""
        if n_pairs == 1:
            return w2
        return jnp.stack([w2] * n_pairs, axis=1).reshape(
            sb * n_pairs, w2.shape[-1])

    def stage_front_stats(s):
        """Conditioning + RAW DFT + smoothed auto-spectra for sub-tile s.
        Unlike stage_front the spectra are kept raw (the coherence
        estimator wants unwhitened periodograms); the per-mic PHAT factor
        is carried separately and folded into the cross stage."""
        x = frames_ref[s * sb:(s + 1) * sb].astype(jnp.float32)
        x = x.reshape(sb * n_mics, n)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        x = (x - mean) * window_ref[:]
        re = jnp.dot(x, cos_ref[:], preferred_element_type=jnp.float32,
                     precision=mxu_precision)
        im = jnp.dot(x, msin_ref[:], preferred_element_type=jnp.float32,
                     precision=mxu_precision)
        auto = re * re + im * im  # [SB*M, F] raw periodogram
        inv = None
        if phat:
            inv = jax.lax.rsqrt(auto + phat_eps * phat_eps)
        # raw Nyquist bin (always present: stats mode requires the folded
        # even-length DFT): feeds both the smoothing correction and the
        # static-band correlogram contribution
        alt = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % 2 == 0,
            jnp.float32(1.0), jnp.float32(-1.0))
        re_nyq = jnp.sum(x * alt, axis=-1, keepdims=True)  # [SB*M, 1]
        inv_nyq = None
        if phat:
            inv_nyq = jax.lax.rsqrt(re_nyq * re_nyq + phat_eps * phat_eps)
        auto_s = _smooth(auto, re_nyq * re_nyq)
        f = re.shape[-1]
        return dict(
            re=re.reshape(sb, n_mics, f), im=im.reshape(sb, n_mics, f),
            inv=None if inv is None else inv.reshape(sb, n_mics, f),
            auto_s=auto_s.reshape(sb, n_mics, f),
            re_nyq=re_nyq.reshape(sb, n_mics, 1),
            inv_nyq=(None if inv_nyq is None
                     else inv_nyq.reshape(sb, n_mics, 1)))

    def stage_cross_stats(front):
        """Raw per-pair cross-power -> smoothed coherence -> (auto) band
        weight -> whitened+banded cross-power for synthesis, plus the
        extras the phase-slope peak stage consumes."""
        re, im = front["re"], front["im"]
        inv, auto_s = front["inv"], front["auto_s"]
        re_nyq, inv_nyq = front["re_nyq"], front["inv_nyq"]
        f = re.shape[-1]
        rrs, jjs, nyqs, gaas, gbbs, invijs = [], [], [], [], [], []
        for (i, j) in pairs:
            rrs.append(re[:, i, :] * re[:, j, :] + im[:, i, :] * im[:, j, :])
            jjs.append(re[:, i, :] * im[:, j, :] - im[:, i, :] * re[:, j, :])
            nyqs.append(re_nyq[:, i, :] * re_nyq[:, j, :])  # [SB, 1] raw
            gaas.append(auto_s[:, i, :])
            gbbs.append(auto_s[:, j, :])
            if inv is not None:
                invijs.append(inv[:, i, :] * inv[:, j, :])
        rr_raw = jnp.stack(rrs, axis=1).reshape(sb * n_pairs, f)
        jj_raw = jnp.stack(jjs, axis=1).reshape(sb * n_pairs, f)
        nyq_raw = jnp.stack(nyqs, axis=1).reshape(sb * n_pairs, 1)
        gaa = jnp.stack(gaas, axis=1).reshape(sb * n_pairs, f)
        gbb = jnp.stack(gbbs, axis=1).reshape(sb * n_pairs, f)
        # smoothed cross-spectrum -> magnitude-squared coherence
        # (ops.xcorr.smoothed_cross_stats; Im at Nyquist is exactly 0)
        rr_s = _smooth(rr_raw, nyq_raw)
        jj_s = _smooth(jj_raw)
        g2 = jnp.clip((rr_s * rr_s + jj_s * jj_s)
                      / (gaa * gbb + phat_eps * phat_eps), 0.0, 1.0)

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (sb, f), 1)
        wband = None
        if sc.band_auto:
            # pair-mean coherence -> per-event band weight
            # (ops.xcorr.auto_band_weight; DC excluded by `interior`,
            # Nyquist excluded by the fold itself)
            g2_3 = g2.reshape(sb, n_pairs, f)
            g2m = g2_3[:, 0, :]
            for p_i in range(1, n_pairs):
                g2m = g2m + g2_3[:, p_i, :]
            g2m = g2m * jnp.float32(1.0 / n_pairs)
            interior = lane1 > 0
            g2i = jnp.where(interior, g2m, 0.0)
            thr = jnp.maximum(
                sc.auto_rel * jnp.max(g2i, axis=-1, keepdims=True),
                jnp.float32(sc.auto_floor))
            # bools -> f32 via where (Mosaic's bool astype recurses)
            selb = jnp.where(g2i >= thr, 1.0, 0.0)
            enough = (jnp.sum(selb, -1, keepdims=True)
                      >= jnp.float32(sc.auto_min_bins))
            wband = jnp.where(
                enough, selb,
                jnp.where(interior, 1.0, 0.0))  # [SB, F]

        # whitened cross-power for the correlogram (PHAT factorizes per
        # mic for M >= 3; the 2-mic single pair whitens directly)
        if phat and per_mic:
            invij = jnp.stack(invijs, axis=1).reshape(sb * n_pairs, f)
            rr_w, jj_w = rr_raw * invij, jj_raw * invij
            nyq_w = nyq_raw * jnp.stack(
                [inv_nyq[:, i, :] * inv_nyq[:, j, :] for (i, j) in pairs],
                axis=1).reshape(sb * n_pairs, 1)
        elif phat:
            inv1 = jax.lax.rsqrt(
                rr_raw * rr_raw + jj_raw * jj_raw + phat_eps * phat_eps)
            rr_w, jj_w = rr_raw * inv1, jj_raw * inv1
            nyq_w = nyq_raw * jax.lax.rsqrt(
                nyq_raw * nyq_raw + phat_eps * phat_eps)
        else:
            rr_w, jj_w, nyq_w = rr_raw, jj_raw, nyq_raw
        if wband is not None:
            # the per-event band weights the cross-power before synthesis
            # (the static band is instead folded into sync/syns rows);
            # Nyquist is always out-of-band (inv_fft_len == 0 upstream)
            wrows = _expand_rows(wband)
            rr_w, jj_w = rr_w * wrows, jj_w * wrows
        # Nyquist correlogram contribution (zero when the band — static
        # or auto — excludes it: alt_l carries inv_fft_len == 0 then)
        nyq_corrs = None
        if nyq_fold and inv_fft_len != 0.0:
            nyq_corrs = [
                nyq_w.reshape(sb, n_pairs, 1)[:, p_i, :] * alt_l
                for p_i in range(n_pairs)]
        extras = dict(rr_raw=rr_raw, jj_raw=jj_raw, g2=g2, wband=wband,
                      lane1=lane1)
        return rr_w, jj_w, (nyq_corrs or []), extras

    def phase_slope_tdoa(extras, idx, tdoa_par):
        """Coherence-weighted phase-slope regression refined from the
        integer argmax (ops.xcorr.tdoa_phase_slope), with the hybrid
        coherence gate; all on the VMEM-resident raw cross-power."""
        rr, jj, g2 = extras["rr_raw"], extras["jj_raw"], extras["g2"]
        f = rr.shape[-1]
        kf = jax.lax.broadcasted_iota(
            jnp.int32, (sb * n_pairs, f), 1).astype(jnp.float32)
        w = (rr * rr + jj * jj) * g2
        if extras["wband"] is not None:
            wb = _expand_rows(extras["wband"])
        elif sc.band_lanes is not None:
            lo, hi = sc.band_lanes
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (sb * n_pairs, f), 1)
            wb = jnp.where((lane >= lo) & (lane < hi), 1.0, 0.0)
        else:
            wb = None
        if wb is not None:
            w = w * wb
        # normalize per row: |R|^2 ~ 1e28 at ADC scale would overflow f32
        # in the k^2-weighted sums (the unfused path runs the same sums
        # un-normalized and sits just under f32 max; the ratio is
        # scale-invariant, so normalizing only changes rounding)
        w = w / jnp.maximum(
            jnp.max(w, axis=-1, keepdims=True), jnp.float32(1e-30))
        den = jnp.sum(w * kf * kf, axis=-1, keepdims=True)
        # scalars pre-folded in f32 (a numpy f64 intermediate would
        # promote the whole chain and break the f32 output refs)
        omega = jnp.float32(2.0 * np.pi / sc.fft_length)
        gain_d = jnp.float32(-sc.fft_length / (2.0 * np.pi))
        d = idx.astype(jnp.float32) - jnp.float32(k_half)  # [rows, 1]
        for _ in range(2):  # Gauss-Newton on the wrapped-phase model
            ang = omega * kf * d
            c, s_ = jnp.cos(ang), jnp.sin(ang)
            re_rot = rr * c - jj * s_
            im_rot = rr * s_ + jj * c
            phi = _atan2(im_rot, re_rot)
            num = jnp.sum(w * kf * phi, axis=-1, keepdims=True)
            delta = gain_d * num / jnp.maximum(den, jnp.float32(1e-20))
            d = d + jnp.clip(delta, -1.0, 1.0)
        if not sc.hybrid:
            return d
        ones = jnp.float32(1.0)
        wb_eff = wb if wb is not None else jnp.full_like(g2, ones)
        coh = (jnp.sum(g2 * wb_eff, axis=-1, keepdims=True)
               / jnp.maximum(jnp.sum(wb_eff, axis=-1, keepdims=True),
                             jnp.float32(1e-12)))
        return jnp.where(coh >= sc.hybrid_min, d, tdoa_par)

    def stage_out(s, corr, extras=None):
        """Peaks + taper (VPU) and output writes for one sub-tile."""
        rows = slice(s * sb, (s + 1) * sb)
        if not with_peaks:
            out_ref[rows] = corr.reshape(sb, n_pairs, l_pad)
            return
        # ---- peak handling fused in-kernel (gather-free one-hot sums) ----
        k = k_half
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (sb * n_pairs, l_pad), 1)
        valid = lane < num_lags
        neg = jnp.float32(-3e38)
        masked = jnp.where(valid, corr, neg)
        # argmax (first max wins, matching jnp.argmax / the ref's > scan)
        v0 = jnp.max(masked, axis=-1, keepdims=True)
        is_max = (masked == v0) & valid
        big = jnp.where(is_max, lane, l_pad)
        idx = jnp.min(big, axis=-1, keepdims=True)  # [rows, 1]
        # neighbors via one-hot sums (gather-free)
        cm = jnp.sum(jnp.where(lane == idx - 1, corr, 0.0), -1,
                     keepdims=True)
        cp = jnp.sum(jnp.where(lane == idx + 1, corr, 0.0), -1,
                     keepdims=True)
        den = cm - 2.0 * v0 + cp
        interior = (idx >= 1) & (idx <= num_lags - 2)
        delta = jnp.where(
            (jnp.abs(den) > 1e-20) & interior, 0.5 * (cm - cp) / den, 0.0)
        delta = jnp.clip(delta, -0.5, 0.5)
        shift = (idx - k).astype(jnp.float32)
        tdoa = shift + delta
        if sc is not None and sc.phase:
            # phase-slope / hybrid sub-sample refinement in-kernel
            tdoa = phase_slope_tdoa(extras, idx, tdoa)

        # Gaussian taper around the integer peak (correlations.c:26-33)
        d = (lane - idx).astype(jnp.float32)
        tapered = corr * jnp.exp(-(d * d) / jnp.float32(taper_denom))

        # peak-to-sidelobe confidence on the RAW correlogram (before
        # tapering, which would manufacture a dominant peak even for noise)
        outside = (jnp.abs(lane - idx) > 3) & valid
        side = jnp.max(jnp.where(outside, corr, neg), axis=-1,
                       keepdims=True)
        psr = jnp.abs(v0) / jnp.maximum(jnp.abs(side), 1e-20)

        out_ref[rows] = tapered.reshape(sb, n_pairs, l_pad)

        if compact:
            # ---- Mode B: SRP scoring + grid argmax INSIDE the kernel ----
            # The r3 headline trace showed the kernel boundary (full-lane
            # aux relayout copies + bf16 cast-slice-reshape + the external
            # scoring fusion) costing ~30% of device time.  Here the
            # tapered correlograms never leave VMEM: per-pair bf16 matmuls
            # against the resident steering matrix accumulate the SRP
            # scores, the grid argmax runs on the VPU, and everything the
            # solver path needs leaves as ONE compact [SB, 128] row:
            # lanes [0:P) shift | [P:2P) tdoa | [2P:3P) peak | [3P:4P) psr
            # | [4P] argmax cell | [4P+1] max score.
            tp = tapered.reshape(sb, n_pairs, l_pad)
            acc = None
            for pi in range(n_pairs):
                part = jnp.dot(
                    tp[:, pi, :].astype(jnp.bfloat16), onehot_ref[pi],
                    preferred_element_type=jnp.float32)  # [SB, G]
                acc = part if acc is None else acc + part
            glane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
            gmask = glane < srp_g
            smax = jnp.max(jnp.where(gmask, acc, neg), -1, keepdims=True)
            sidx = jnp.min(
                jnp.where((acc == smax) & gmask, glane, srp_g),
                -1, keepdims=True)  # first max, matching jnp.argmax

            packed = jnp.concatenate(
                [lanes_from_rows(shift), lanes_from_rows(tdoa),
                 lanes_from_rows(v0), lanes_from_rows(psr),
                 sidx.astype(jnp.float32), smax,
                 jnp.zeros((sb, 128 - 4 * n_pairs - 2), jnp.float32)],
                axis=1)  # [SB, 128]
            cell_ref[rows] = packed
            return

        aux = jnp.where(lane == 0, shift, 0.0)
        aux = aux + jnp.where(lane == 1, tdoa, 0.0)
        aux = aux + jnp.where(lane == 2, v0, 0.0)
        aux = aux + jnp.where(lane == 3, psr, 0.0)
        aux_ref[rows] = aux.reshape(sb, n_pairs, l_pad)

    # software-pipelined emission: front(s+1) ahead of cross/synth/out(s)
    f_front = stage_front_stats if sc is not None else stage_front
    front = f_front(0)
    for s in range(sub_tiles):
        nxt = f_front(s + 1) if s + 1 < sub_tiles else None
        if sc is not None:
            rr, jj, nyq_corrs, extras = stage_cross_stats(front)
        else:
            rr, jj, nyq_corrs = stage_cross(front)
            extras = None
        corr = stage_synth(rr, jj, nyq_corrs)
        stage_out(s, corr, extras)
        front = nxt


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "pairs_tuple", "tile_b", "interpret",
                     "with_peaks"))
def _fused_gcc_call(frames, window, cfg: PipelineConfig, pairs_tuple,
                    tile_b: int, interpret: bool, with_peaks: bool,
                    srp_onehot=None):
    b, m, n = frames.shape
    pairs = pairs_tuple
    p = len(pairs)
    k = cfg.max_shift
    num_lags = 2 * k + 1
    l_pad = _round_up(num_lags, 128)

    crop = mxu_fft.crop_bins(cfg)
    if crop is not None:
        # band-crop fast path: only in-band bins enter the kernel at all
        # (identical correlograms to the masked full-band form); no
        # Nyquist fold — the cropped width is already small
        cos, msin = mxu_fft.dft_matrices_band(
            n, cfg.fft_length, *crop, "float32")
        sync, syns = mxu_fft.lag_synthesis_matrices_band(
            cfg.fft_length, k, *crop, "float32")
        nyq_in_band = True  # unused: no fold
        nyq_fold = False
    else:
        cos, msin = mxu_fft.dft_matrices(n, cfg.fft_length, "float32")
        sync, syns = mxu_fft.lag_synthesis_matrices(
            cfg.fft_length, k, "float32")
        # band limit (cfg.band_hz): zero out-of-band synthesis rows — free
        # at run time; the Nyquist bin's in-kernel reconstruction is
        # disabled via inv_fft_len = 0 below when the band excludes it
        mask = xcorr_ops.band_mask(cfg)
        nyq_in_band = True
        if mask is not None:
            sync = sync * mask[:, None]
            syns = syns * mask[:, None]
            nyq_in_band = bool(mask[-1])
        # Nyquist fold: drop the last spectral column/row (F = L/2+1 ->
        # L/2, a 128 multiple, so no Mosaic lane padding) and reconstruct
        # the bin exactly inside the kernel (see _gcc_kernel docstring)
        nyq_fold = cfg.fft_length % 2 == 0
        if nyq_fold:
            cos, msin = cos[:, :-1], msin[:, :-1]
            sync, syns = sync[:-1], syns[:-1]
    # pad lag axis to the 128-lane boundary
    sync = np.pad(sync, [(0, 0), (0, l_pad - sync.shape[1])])
    syns = np.pad(syns, [(0, 0), (0, l_pad - syns.shape[1])])
    gain = 256.0 if cfg.normalize_mode == "shift8" else 1.0
    win = window.astype(jnp.float32)
    if not cfg.window_enabled:
        # parity with the unfused path: conditioning skips the window
        win = jnp.ones_like(win)
    win = win * gain

    # in-kernel spectral stats: per-event auto band (band_hz='auto') and/or
    # phase-slope/hybrid sub-sample TDOA — the r4 verdict's headline item
    # (the unfused fallback cost 36x and OOM'd at headline batch scale)
    need_band = cfg.band_auto
    need_phase = (with_peaks and cfg.subsample_peak
                  and cfg.subsample_method in ("phase", "hybrid"))
    stats_cfg = None
    if need_band or need_phase:
        if crop is not None or not nyq_fold:
            raise ValueError(
                "in-kernel spectral stats need the folded full-band DFT "
                "(band_crop off, even fft_length); the dispatch in "
                "models.localizer._fused_tile should have routed this "
                "config to the unfused path")
        band_lanes = None
        if cfg.band_hz is not None and not cfg.band_auto:
            lo_b, hi_b = mxu_fft.band_bins(
                cfg.fft_length, cfg.sample_rate_hz, *cfg.band_hz)
            band_lanes = (lo_b, min(hi_b, cfg.fft_length // 2))
        if cfg.band_auto:
            nyq_in_band = False  # the auto band always excludes Nyquist
        stats_cfg = _StatsCfg(
            band_auto=cfg.band_auto, auto_rel=cfg.auto_band_rel,
            auto_floor=cfg.auto_band_floor,
            auto_min_bins=cfg.auto_band_min_bins,
            hw=cfg.coherence_bins, f_full=cfg.fft_length // 2 + 1,
            fft_length=cfg.fft_length, phase=need_phase,
            hybrid=cfg.subsample_method == "hybrid",
            hybrid_min=cfg.hybrid_coherence_min, band_lanes=band_lanes)

    grid = (b // tile_b,)
    sub_tiles = cfg.fused_sub_tiles
    if tile_b % sub_tiles != 0:
        sub_tiles = 1
    # compact peak outputs: only with in-kernel SRP (Mode B).  Measured on
    # v5e-lite (r3): packing the per-pair scalars into one 128-lane row
    # costs ~1 us/tile of Mosaic sublane->lane relayout — MORE than the
    # full-lane aux tensor's relayout copies cost outside the kernel
    # (device 3.29 vs 2.95 ms/iter on the headline config), so the classic
    # aux output stays the default.
    # compact == Mode B (in-kernel SRP + peaks packed into one [SB, 128]
    # row).  A compact-WITHOUT-scoring variant was measured and removed:
    # the sublane->lane relayout of the packed row costs more than the
    # full-lane aux tensor's relayout copies outside (3.29 vs 2.95 ms/iter)
    compact = (with_peaks and 4 * p + 2 <= 128 and srp_onehot is not None
               and stats_cfg is None)
    kernel = functools.partial(
        _gcc_kernel, pairs=pairs, phat=cfg.phat, phat_eps=cfg.phat_eps,
        n=n, tile_b=tile_b, n_mics=m, num_lags=num_lags,
        taper_denom=cfg.taper_denom, with_peaks=with_peaks,
        mxu_precision=(jax.lax.Precision.HIGHEST
                       if cfg.dft_precision == "highest" else None),
        nyq_fold=nyq_fold,
        inv_fft_len=(1.0 / cfg.fft_length) if nyq_in_band else 0.0,
        sub_tiles=sub_tiles,
        srp_g=int(srp_onehot.shape[-1]) if compact else 0,
        compact=compact, stats_cfg=stats_cfg)
    smooth_mat = None
    if stats_cfg is not None:
        # banded smoothing matrix [F_k + 1, F_k]: row k weights bin k's
        # contribution 1/count[f] into every window |k - f| <= hw; the
        # last row is the Nyquist bin's correction (ops.xcorr.freq_smooth
        # semantics with edge counts over the FULL rfft bin set)
        f_k = cfg.fft_length // 2
        hw = stats_cfg.hw
        f_full = stats_cfg.f_full
        ks = np.arange(f_k + 1)[:, None]  # source bin (F_k = Nyquist)
        fs_ = np.arange(f_k)[None, :]     # target bin
        src = np.where(ks == f_k, f_full - 1, ks)
        counts = (np.minimum(fs_ + hw, f_full - 1)
                  - np.maximum(fs_ - hw, 0) + 1).astype(np.float64)
        smooth_mat = np.where(
            np.abs(src - fs_) <= hw, 1.0 / counts, 0.0).astype(np.float32)

    if stats_cfg is not None and with_peaks:
        def kernel(f, w, c, ms, sc, ss, sm, corr, aux,  # noqa: F811
                   _k=kernel):
            _k(f, w, c, ms, sc, ss, corr, aux, smooth_ref=sm)
    elif stats_cfg is not None:
        def kernel(f, w, c, ms, sc, ss, sm, corr,  # noqa: F811
                   _k=kernel):
            _k(f, w, c, ms, sc, ss, corr, None, smooth_ref=sm)
    elif not with_peaks:
        def kernel(*refs, _k=kernel):  # noqa: F811 - drop the aux ref slot
            _k(*refs, None)
    elif compact:
        # refs: ...inputs(incl. onehot), corr, compact row
        def kernel(f, w, c, ms, sc, ss, oh, corr, cell,  # noqa: F811
                   _k=kernel):
            _k(f, w, c, ms, sc, ss, corr, None, onehot_ref=oh,
               cell_ref=cell)

    block = pl.BlockSpec((tile_b, p, l_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, p, l_pad), jnp.float32)
    in_specs = [
        pl.BlockSpec((tile_b, m, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # window
        pl.BlockSpec(memory_space=pltpu.VMEM),  # cos
        pl.BlockSpec(memory_space=pltpu.VMEM),  # msin
        pl.BlockSpec(memory_space=pltpu.VMEM),  # sync
        pl.BlockSpec(memory_space=pltpu.VMEM),  # syns
    ]
    inputs = [frames, win, jnp.asarray(cos), jnp.asarray(msin),
              jnp.asarray(sync), jnp.asarray(syns)]
    if smooth_mat is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # smoothing
        inputs.append(jnp.asarray(smooth_mat))
    if compact:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # onehot
        inputs.append(srp_onehot.astype(jnp.bfloat16))
        cell_block = pl.BlockSpec((tile_b, 128), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
        out_specs = (block, cell_block)
        out_shapes = (out_shape,
                      jax.ShapeDtypeStruct((b, 128), jnp.float32))
    elif with_peaks:
        out_specs, out_shapes = (block, block), (out_shape, out_shape)
    else:
        out_specs, out_shapes = block, out_shape
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        # big tiles need more than the default 16 MB scoped-VMEM budget;
        # the batch-tile grid dimension is embarrassingly parallel (every
        # tile writes a disjoint output block), so tell Mosaic it may
        # overlap/reorder grid steps (cross-step DMA/compute pipelining)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(*inputs)

    if not with_peaks:
        return outs[..., :num_lags]
    if compact:
        corr_t, packed = outs
        return (corr_t[..., :num_lags],
                packed[:, 0:p].astype(jnp.int32),     # best shift
                packed[:, p:2 * p],                   # sub-sample tdoa
                packed[:, 2 * p:3 * p],               # peak value
                packed[:, 3 * p:4 * p],               # psr
                packed[:, 4 * p].astype(jnp.int32),   # SRP argmax cell
                packed[:, 4 * p + 1])                 # SRP max score
    corr_t, aux = outs
    return (corr_t[..., :num_lags],
            aux[..., 0].astype(jnp.int32),  # integer best shift
            aux[..., 1],  # sub-sample tdoa (lags)
            aux[..., 2],  # peak value
            aux[..., 3])  # peak-to-sidelobe ratio (raw correlogram)


def fused_gcc(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    *,
    tile_b: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Conditioned (untapered) correlograms [B, P, 2K+1] straight from raw
    frames [B, M, N] (includes DC removal, gain and windowing).

    B must be a multiple of tile_b (pad the batch if needed)."""
    b = frames.shape[0]
    if b % tile_b != 0:
        raise ValueError(f"batch {b} not a multiple of tile_b {tile_b}")
    pairs_tuple = tuple(tuple(int(v) for v in row) for row in np.asarray(pairs))
    return _fused_gcc_call(
        frames, window, cfg, pairs_tuple, tile_b, interpret, False)


def fused_gcc_peaks(
    frames: jnp.ndarray,
    window: jnp.ndarray,
    pairs: np.ndarray,
    cfg: PipelineConfig,
    *,
    tile_b: int = 64,
    interpret: bool = False,
    srp_onehot: jnp.ndarray | None = None,
):
    """Full fused front half of the pipeline: raw frames [B, M, N] ->
    (tapered correlograms [B, P, L], best shifts int32 [B, P],
    sub-sample TDOAs [B, P] in lags, peak values [B, P], psr [B, P]).

    The taper, argmax and parabolic interpolation run inside the kernel on
    VMEM-resident correlograms using gather-free one-hot reductions.

    ``srp_onehot`` ([P, L_pad, G] steering matrix, zero rows at lag
    padding) additionally runs SRP scoring (per-pair bf16 matmuls against
    the VMEM-resident matrix) AND the grid argmax inside the kernel —
    the tapered correlograms never leave VMEM for scoring, and the only
    extra HBM traffic is one compact [B, 128] row (r3 trace: the external
    scoring path cost ~30% of headline device time in boundary copies and
    fusions).  Two more values are returned: argmax cell int32 [B] and
    max score f32 [B]."""
    b = frames.shape[0]
    if b % tile_b != 0:
        raise ValueError(f"batch {b} not a multiple of tile_b {tile_b}")
    pairs_tuple = tuple(tuple(int(v) for v in row) for row in np.asarray(pairs))
    return _fused_gcc_call(
        frames, window, cfg, pairs_tuple, tile_b, interpret, True,
        srp_onehot)


def fused_gcc_fits_vmem(n_mics: int, n: int, cfg: PipelineConfig,
                        tile_b: int = 64,
                        vmem_budget: int = 14 * 1024 * 1024) -> bool:
    """Conservative VMEM feasibility estimate for the fused kernel."""
    crop = mxu_fft.crop_bins(cfg)
    if crop is not None:
        # band-crop: only in-band bins enter the kernel (Mosaic pads the
        # lane dim to 128)
        f = max(128, _round_up(crop[1] - crop[0], 128))
    else:
        # Nyquist fold drops the odd last bin (see _gcc_kernel)
        f = (cfg.fft_length // 2 if cfg.fft_length % 2 == 0
             else cfg.fft_length // 2 + 1)
    p = n_mics * (n_mics - 1) // 2
    l_pad = _round_up(cfg.num_lags, 128)
    weights = 4 * (2 * n * f + 2 * f * l_pad + n)
    acts = 4 * (tile_b * n_mics * n + 4 * tile_b * n_mics * f
                + 2 * tile_b * p * f + tile_b * p * l_pad)
    if cfg.band_auto or (cfg.subsample_peak
                         and cfg.subsample_method in ("phase", "hybrid")):
        # spectral-stats mode keeps the raw cross-power, its smoothed
        # form, the coherence, and the phase-regression weights resident
        # alongside the whitened path (_gcc_kernel stage_cross_stats),
        # plus the resident [F+1, F] banded smoothing matrix
        acts += 4 * (2 * tile_b * n_mics * f + 6 * tile_b * p * f)
        weights += 4 * (f + 1) * f
    return weights + acts <= vmem_budget


def pick_tile_b(n_mics: int, n: int, cfg: PipelineConfig,
                preferred: int = 64) -> int | None:
    """Largest batch tile (preferred, then halves down to 8) that fits VMEM;
    None when even the smallest doesn't (use the unfused/large-array path)."""
    tb = preferred
    while tb >= 8:
        if fused_gcc_fits_vmem(n_mics, n, cfg, tb):
            return tb
        tb //= 2
    return None
