"""Differentiable PESQ (P.862.2 wideband) objective and MOS estimator.

JAX re-implementation of the capability the reference gets from
``torch_pesq.PesqLoss`` (reference fdbm/model.py:19,66-68,179-185,213-218):
a fully differentiable perceptual speech-quality penalty mixed into the
``data_prediction`` / ``data_prediction_hybrid`` objectives when
``pesq_weight > 0``, plus a MOS-LQO estimate used as an evaluation metric.

The pipeline follows ITU-T P.862 / P.862.2's perceptual model (as
torch_pesq does):

1. level alignment of both signals to a fixed active-band power,
2. Hann STFT power spectra (32 ms / 50% overlap at 16 kHz),
3. Bark-scale band powers (49 bands, ``z = 7 asinh(f/650)``),
4. partial frequency-response compensation of the reference,
5. short-term gain compensation of the degraded signal,
6. Zwicker loudness transform per band,
7. masked disturbance densities (symmetric + asymmetric),
8. L6-over-split-second / L2-over-time aggregation,
9. MOS = 4.5 − 0.1·d_sym − 0.0309·d_asym, mapped through the P.862.2
   wideband sigmoid.

Like torch_pesq, the input time-alignment stage of the full ITU tool is
omitted — inputs are assumed time-aligned, which holds for enhancement
losses/metrics where both signals derive from the same utterance. Band
edges and the absolute hearing threshold use the standard analytic forms
(asinh Bark scale, ISO-389-7-style threshold) rather than the ITU lookup
tables, so absolute MOS values can deviate from the ITU binary by a small
offset; ordering/monotonicity (what a loss and a best-checkpoint metric
need) is preserved. This is a documented deviation — the image provides
neither ``pesq`` nor ``torch_pesq`` to oracle against.

All functions are pure jnp, fp32, static-shape, jit- and grad-safe.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

_FS = 16000
_N_FFT = 512
_HOP = 256
_NBARK = 49
_TARGET_POW = 1e7  # P.862 level-alignment target (≈79 dB SPL)
_LISTEN_DB = 79.0


def _bark(f):
    return 7.0 * np.arcsinh(np.asarray(f, np.float64) / 650.0)


def _bark_inv(z):
    return 650.0 * np.sinh(np.asarray(z, np.float64) / 7.0)


@functools.lru_cache(maxsize=4)
def _band_tables(n_fft: int = _N_FFT, fs: int = _FS, nbark: int = _NBARK):
    """Returns (binning matrix [nbark, F], centre freqs [nbark],
    abs threshold powers [nbark], loudness scale Sl)."""
    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0.0, fs / 2.0, n_bins)
    z_edges = np.linspace(_bark(50.0), _bark(min(8000.0, fs / 2.0)), nbark + 1)
    f_edges = _bark_inv(z_edges)
    centres = _bark_inv(0.5 * (z_edges[:-1] + z_edges[1:]))
    # hard assignment of each FFT bin to its Bark band
    m = np.zeros((nbark, n_bins), np.float32)
    idx = np.clip(np.searchsorted(f_edges, freqs) - 1, 0, nbark - 1)
    valid = (freqs >= f_edges[0]) & (freqs <= f_edges[-1])
    for k in range(n_bins):
        if valid[k]:
            m[idx[k], k] = 1.0
    # absolute hearing threshold (dB SPL, ISO 389-7 analytic approximation)
    fk = centres / 1000.0
    thr_db = (3.64 * fk ** -0.8
              - 6.5 * np.exp(-0.6 * (fk - 3.3) ** 2)
              + 1e-3 * fk ** 4)
    # convert to the internal power scale where _TARGET_POW ≈ _LISTEN_DB SPL
    thr_pow = 10.0 ** (thr_db / 10.0 - _LISTEN_DB / 10.0) * _TARGET_POW
    return (jnp.asarray(m), jnp.asarray(centres, jnp.float32),
            jnp.asarray(thr_pow, jnp.float32))


def _power_spectra(x: Array, n_fft: int = _N_FFT, hop: int = _HOP) -> Array:
    """[B, L] -> [B, T, F] Hann-window power spectra (no centre padding —
    P.862 frames from the signal start)."""
    b, L = x.shape
    n_frames = max(1, 1 + (L - n_fft) // hop)
    win = jnp.asarray(np.hanning(n_fft).astype(np.float32))
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    # static pad arithmetic (shapes are compile-time constants)
    pad = max(0, (n_frames - 1) * hop + n_fft - L)
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    frames = xp[:, idx] * win  # [B, T, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)
    return (jnp.abs(spec) ** 2).astype(jnp.float32)


def _level_align(pow_spec: Array, freqs_mask: Array) -> Array:
    """Scale power spectra so mean active-band power == _TARGET_POW."""
    band_pow = jnp.sum(pow_spec * freqs_mask[None, None, :], axis=-1)  # [B,T]
    mean_pow = jnp.mean(band_pow, axis=-1)  # [B]
    factor = _TARGET_POW / (mean_pow + 1e-20)
    return pow_spec * factor[:, None, None]


def _loudness(band_pow: Array, thr: Array, gamma: float = 0.23,
              sl: float = 0.18660549) -> Array:
    """Zwicker loudness per Bark band (P.862 eq. for Sone density)."""
    ratio = band_pow / thr[None, None, :]
    l = sl * (thr[None, None, :] / 0.5) ** gamma * \
        ((0.5 + 0.5 * ratio) ** gamma - 1.0)
    return jnp.where(ratio > 1.0, l, 0.0)


@functools.lru_cache(maxsize=16)
def _smooth_matrix(t: int) -> np.ndarray:
    """Closed form of h[t] = 0.8 h[t-1] + 0.2 r[t], h[0] = r[0], as a
    lower-triangular [T, T] weight matrix (one parallel matmul instead of
    a sequential scan — XLA while-loops compile pathologically slowly on
    the target toolchain, BENCH_NOTES.md)."""
    k = np.arange(t)
    delta = k[:, None] - k[None, :]
    w = np.where(delta >= 0, 0.2 * 0.8 ** np.maximum(delta, 0), 0.0)
    w[:, 0] = 0.8 ** k  # initial condition h[0] = r[0]
    return w.astype(np.float32)


def _smooth_gain(ratio: Array) -> Array:
    """First-order recursive smoothing h[t] = 0.8 h[t-1] + 0.2 r[t]."""
    w = jnp.asarray(_smooth_matrix(ratio.shape[1]))
    return jnp.einsum("bk,tk->bt", ratio, w)


def pesq_disturbances(ref: Array, deg: Array,
                      sample_rate: int = _FS) -> Tuple[Array, Array]:
    """Symmetric and asymmetric disturbances [B] for time-aligned batches.

    ref, deg: [B, L] float32 waveforms (any common scale — level-aligned
    internally).
    """
    if sample_rate != _FS:
        raise NotImplementedError(
            f"PESQ loss is 16 kHz-only (got {sample_rate}); the reference "
            f"pipeline likewise operates at 16 kHz.")
    ref = ref.astype(jnp.float32)
    deg = deg.astype(jnp.float32)
    m, centres, thr = _band_tables()
    n_bins = _N_FFT // 2 + 1
    freqs = np.linspace(0.0, _FS / 2.0, n_bins)
    align_mask = jnp.asarray(((freqs >= 325.0) & (freqs <= 3250.0))
                             .astype(np.float32))

    p_ref = _level_align(_power_spectra(ref), align_mask)  # [B,T,F]
    p_deg = _level_align(_power_spectra(deg), align_mask)

    b_ref = jnp.einsum("btf,zf->btz", p_ref, m)  # [B,T,49]
    b_deg = jnp.einsum("btf,zf->btz", p_deg, m)

    # active (speech) frames from the reference only — constant w.r.t. the
    # estimate, so gradients flow only through the degraded branch
    audible_ref = jnp.sum(jnp.where(b_ref > thr[None, None, :], b_ref, 0.0),
                          axis=-1)  # [B,T]
    active = jax.lax.stop_gradient(
        (audible_ref > 1e7 * 10 ** (-3.5)).astype(jnp.float32))
    n_active = jnp.maximum(jnp.sum(active, axis=-1), 1.0)  # [B]

    # partial frequency compensation of the reference (linear distortions
    # are not penalised). Following the ITU formulation the per-band means
    # include only band-frames where the *reference* power is well above
    # the absolute threshold — additive noise in bands the reference never
    # excites is NOT absorbed as frequency response.
    aud = jax.lax.stop_gradient(
        (b_ref > 100.0 * thr[None, None, :]).astype(jnp.float32)
    ) * active[:, :, None]
    sum_ref = jnp.sum(b_ref * aud, axis=1)  # [B,49]
    sum_deg = jnp.sum(b_deg * aud, axis=1)
    fcomp = jnp.clip((sum_deg + 1000.0) / (sum_ref + 1000.0), 0.01, 100.0)
    b_ref_c = b_ref * fcomp[:, None, :]

    # short-term gain compensation of the degraded signal
    tot_ref = jnp.sum(b_ref_c, axis=-1)  # [B,T]
    tot_deg = jnp.sum(b_deg, axis=-1)
    ratio = (tot_ref + 5e3) / (tot_deg + 5e3)
    gain = jnp.clip(_smooth_gain(ratio), 3e-4, 5.0)
    b_deg_c = b_deg * gain[:, :, None]

    l_ref = _loudness(b_ref_c, thr)
    l_deg = _loudness(b_deg_c, thr)

    # masked disturbance: deadzone of 0.25*min
    d = l_deg - l_ref
    dead = 0.25 * jnp.minimum(l_deg, l_ref)
    d = jnp.sign(d) * jnp.maximum(jnp.abs(d) - dead, 0.0)

    # symmetric (L2 over Bark widths) and asymmetric (L1 with asymmetry
    # factor) frame disturbances, both weighted by the Bark band width
    # (uniform grid => constant width). eps inside the roots keeps
    # gradients finite where the disturbance is exactly zero (deadzone).
    width = float(
        (_bark(min(8000.0, _FS / 2.0)) - _bark(50.0)) / _NBARK)
    d_sym = jnp.sqrt(jnp.sum((d * width) ** 2, axis=-1) + 1e-12)  # [B,T]
    h = ((b_deg_c + 50.0) / (b_ref_c + 50.0)) ** 1.2
    h = jnp.where(h < 3.0, 0.0, jnp.minimum(h, 12.0))
    d_asym = jnp.sum(jnp.abs(d) * h * width, axis=-1)  # [B,T]

    # loudness-dependent de-emphasis + clipping (P.862 frame weighting)
    emph = ((tot_ref + 1e5) / 1e7) ** 0.04
    d_sym = jnp.minimum(d_sym / emph, 45.0) * active
    d_asym = jnp.minimum(d_asym / emph, 45.0) * active

    # L6 over ~0.32 s split-second intervals (20 frames, hop 10), then L2
    def aggregate(dframe):
        t = dframe.shape[1]
        hop, width = 10, 20
        n_int = max(1, (t - 1) // hop + 1)
        starts = jnp.minimum(jnp.arange(n_int) * hop, max(t - 1, 0))
        pad = jnp.pad(dframe, ((0, 0), (0, width)))
        apad = jnp.pad(active, ((0, 0), (0, width)))
        win_idx = starts[:, None] + jnp.arange(width)[None, :]
        wins = pad[:, win_idx]  # [B, n_int, width]
        awin = apad[:, win_idx]
        cnt = jnp.maximum(jnp.sum(awin, axis=-1), 1.0)
        l6 = (jnp.sum(wins ** 6, axis=-1) / cnt + 1e-12) ** (1.0 / 6.0)
        has = (jnp.sum(awin, axis=-1) > 0).astype(jnp.float32)
        n_has = jnp.maximum(jnp.sum(has, axis=-1), 1.0)
        return jnp.sqrt(jnp.sum(l6 ** 2 * has, axis=-1) / n_has + 1e-12)

    return aggregate(d_sym), aggregate(d_asym)


def pesq_mos(ref: Array, deg: Array, sample_rate: int = _FS) -> Array:
    """MOS-LQO (P.862.2 wideband mapping) per batch item, [B]."""
    d_s, d_a = pesq_disturbances(ref, deg, sample_rate)
    raw = 4.5 - 0.1 * d_s - 0.0309 * d_a
    return 0.999 + 4.0 / (1.0 + jnp.exp(-1.3669 * raw + 3.8224))


def pesq_loss(ref: Array, deg: Array, sample_rate: int = _FS,
              factor: float = 1.0) -> Array:
    """Differentiable per-item PESQ penalty [B] (torch_pesq semantics:
    ``PesqLoss.forward`` returns the raw disturbance mix, minimised at 0;
    the reference calls ``self.pesq_loss(x_td, x_hat_td).mean()``)."""
    d_s, d_a = pesq_disturbances(ref, deg, sample_rate)
    return factor * (0.1 * d_s + 0.0309 * d_a)
