"""Loss library: training objectives and audio-domain criteria.

Re-implements the reference's loss surface (fdbm/loss.py and the inline
losses in fdbm/model.py:162-256) as pure jnp functions:

* ``data_prediction``        — TF-MSE + l1_weight * time-domain L1
  (model.py:163-185)
* ``data_prediction_hybrid`` — default: 70*compressed-mag MSE +
  30*compressed-RI MSE − SI-SNR  (model.py:187-218)
* ``data_prediction_mel``    — TF-MSE + 0.1 * multi-res log-mel L1
  (model.py:220-233)
* ``data_prediction_melphase`` — adds 0.01 * phase loss (IP+GD+PTD)
  (model.py:235-251, loss.py:9-33)
* building blocks: ``phase_loss``, ``mel_spectrogram_loss``,
  ``multiscale_stft_loss``, ``si_sdr_loss``, ``spec_mag_sisnr_loss``
  (loss.py:44-321)

The mel filterbank is a librosa-compatible Slaney-scale implementation
(librosa.filters.mel defaults: htk=False, norm='slaney').
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fdbm_tpu import dsp

Array = jnp.ndarray


def _wmean(per_item: Array, weights: Optional[Array]) -> Array:
    """Batch mean of per-item scalars, optionally weighted.

    ``weights`` ([B], e.g. 0/1) excludes items from the mean — used to mask
    wrap-padded remainder items in validation so duplicated items don't
    bias the loss. ``weights=None`` is the plain mean (training path).
    """
    if weights is None:
        return jnp.mean(per_item)
    w = weights.astype(per_item.dtype)
    return jnp.sum(per_item * w) / jnp.maximum(jnp.sum(w), 1e-8)


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible, Slaney scale + Slaney norm)
# ---------------------------------------------------------------------------


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=64)
def mel_filters(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                fmax: Optional[float] = None) -> np.ndarray:
    """[n_mels, 1 + n_fft//2] triangular Slaney-normalised filterbank."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Building-block losses
# ---------------------------------------------------------------------------


def _unwrap(x: Array) -> Array:
    """|x - 2*pi*round(x/(2*pi))| (reference loss.py:15-17)."""
    two_pi = 2.0 * np.pi
    return jnp.abs(x - two_pi * jnp.round(x / two_pi))


def phase_loss(spec_est: Array, spec_ref: Array,
               weights: Optional[Array] = None) -> Array:
    """Instantaneous-phase + group-delay + time-delay loss (loss.py:9-33).

    spec_*: complex [B, 1, F, T] (channel squeezed internally).
    The reference's banded GD/PTD matmuls are realised as first differences
    along freq/time with a boundary term (identical result, no FxF matmul).
    """
    p_e = jnp.angle(spec_est)[:, 0]  # [B, F, T]
    p_r = jnp.angle(spec_ref)[:, 0]

    def banded_diff(p, axis):
        # column f of M picks p[f-1] - p[f]; column 0 is just -p[0]
        lead = -jnp.take(p, jnp.array([0]), axis=axis)
        sliced_prev = jax.lax.slice_in_dim(p, 0, p.shape[axis] - 1, axis=axis)
        sliced_next = jax.lax.slice_in_dim(p, 1, p.shape[axis], axis=axis)
        return jnp.concatenate([lead, sliced_prev - sliced_next], axis=axis)

    gd_r = banded_diff(p_r, axis=1)
    gd_e = banded_diff(p_e, axis=1)
    ptd_r = banded_diff(p_r, axis=2)
    ptd_e = banded_diff(p_e, axis=2)

    ip = _wmean(jnp.mean(_unwrap(p_r - p_e), axis=(1, 2)), weights)
    gd = _wmean(jnp.mean(_unwrap(gd_r - gd_e), axis=(1, 2)), weights)
    ptd = _wmean(jnp.mean(_unwrap(ptd_r - ptd_e), axis=(1, 2)), weights)
    return ip + gd + ptd


def si_sdr_loss(references: Array, estimates: Array, scaling: bool = True,
                zero_mean: bool = True, clip_min: Optional[float] = None,
                reduction: str = "mean") -> Array:
    """Negative SI-SDR in dB (reference loss.py:44-120). Inputs [B, ..., T]."""
    eps = 1e-8
    nb = references.shape[0]
    refs = references.reshape(nb, -1)
    ests = estimates.reshape(nb, -1)
    if zero_mean:
        refs = refs - jnp.mean(refs, axis=-1, keepdims=True)
        ests = ests - jnp.mean(ests, axis=-1, keepdims=True)
    ref_proj = jnp.sum(refs ** 2, axis=-1) + eps
    dot = jnp.sum(ests * refs, axis=-1) + eps
    scale = (dot / ref_proj)[:, None] if scaling else 1.0
    e_true = scale * refs
    e_res = ests - e_true
    signal = jnp.sum(e_true ** 2, axis=-1)
    noise = jnp.sum(e_res ** 2, axis=-1)
    sdr = -10.0 * jnp.log10(signal / noise + eps)
    if clip_min is not None:
        sdr = jnp.maximum(sdr, clip_min)
    if reduction == "mean":
        return jnp.mean(sdr)
    if reduction == "sum":
        return jnp.sum(sdr)
    return sdr


def _stft_mag(x: Array, n_fft: int, hop: int) -> Array:
    win = jnp.asarray(dsp.hann_window(n_fft))
    spec = dsp.stft(x.reshape(-1, x.shape[-1]), n_fft, hop, win)
    return jnp.abs(spec)


def multiscale_stft_loss(
    x: Array, y: Array,
    win_lengths: Sequence[int] = (2048, 512),
    hop_lengths: Sequence[int] = (512, 128),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,
) -> Array:
    """Multi-scale STFT L1 loss (loss.py:123-210). x = estimate, y = ref."""
    loss = 0.0
    for w, h in zip(win_lengths, hop_lengths):
        xm = _stft_mag(x, w, h)
        ym = _stft_mag(y, w, h)
        loss = loss + log_weight * jnp.mean(jnp.abs(
            jnp.log10(jnp.maximum(xm, clamp_eps) ** pow)
            - jnp.log10(jnp.maximum(ym, clamp_eps) ** pow)
        ))
        loss = loss + mag_weight * jnp.mean(jnp.abs(xm - ym))
    return loss


def mel_spectrogram_loss(
    x: Array, y: Array,
    sample_rate: int = 16000,
    n_mels: Sequence[int] = (150, 80),
    win_lengths: Sequence[int] = (2048, 512),
    hop_lengths: Sequence[int] = (512, 128),
    clamp_eps: float = 1e-5,
    mag_weight: float = 1.0,
    log_weight: float = 1.0,
    pow: float = 2.0,
    weights: Optional[Array] = None,
) -> Array:
    """Multi-resolution mel loss (loss.py:213-289). x = estimate, y = ref
    with shape [B, L]."""
    loss = 0.0
    for nm, w, h in zip(n_mels, win_lengths, hop_lengths):
        xm = _stft_mag(x, w, h)  # [B, F, T]
        ym = _stft_mag(y, w, h)
        fb = jnp.asarray(mel_filters(sample_rate, w, nm))  # [nm, F]
        x_mel = jnp.einsum("bft,mf->bmt", xm, fb)
        y_mel = jnp.einsum("bft,mf->bmt", ym, fb)
        if log_weight > 0:
            log_items = jnp.mean(jnp.abs(
                jnp.log10(jnp.maximum(x_mel, clamp_eps) ** pow)
                - jnp.log10(jnp.maximum(y_mel, clamp_eps) ** pow)
            ), axis=(1, 2))
            loss = loss + log_weight * _wmean(log_items, weights)
        if mag_weight > 0:
            loss = loss + mag_weight * _wmean(
                jnp.mean(jnp.abs(x_mel - y_mel), axis=(1, 2)), weights)
    return loss


# The 7-resolution mel config used by data_prediction_mel/melphase
# (reference model.py:77-98).
MEL7 = dict(
    n_mels=(5, 10, 20, 40, 80, 160, 210),
    win_lengths=(32, 64, 128, 256, 512, 1024, 2048),
    hop_lengths=(8, 16, 32, 64, 128, 256, 512),
    mag_weight=0.0,
    log_weight=1.0,
)


def _sisnr_log10(ref_td: Array, est_td: Array,
                 weights: Optional[Array] = None) -> Array:
    """The hybrid loss's SI-SNR term: log10 ratio, no 10x (model.py:203-211)."""
    dot = jnp.sum(ref_td * est_td, axis=-1, keepdims=True)
    ref_energy = jnp.sum(ref_td ** 2, axis=-1, keepdims=True) + 1e-12
    proj = dot * ref_td / ref_energy
    ratio = jnp.sum(proj ** 2, axis=-1, keepdims=True) / (
        jnp.sum((est_td - proj) ** 2, axis=-1, keepdims=True) + 1e-12
    )
    per_item = jnp.log10(jnp.maximum(ratio, 1e-12)).reshape(ref_td.shape[0], -1)
    return _wmean(jnp.mean(per_item, axis=-1), weights)


def spec_mag_sisnr_loss(est: Array, ref: Array, n_fft: int, hop: int,
                        window: Array) -> Array:
    """Waveform-domain hybrid criterion (loss.py:292-321)."""
    spec_est = dsp.stft(est.reshape(-1, est.shape[-1]), n_fft, hop, window)
    spec_ref = dsp.stft(ref.reshape(-1, ref.shape[-1]), n_fft, hop, window)
    est_mag = jnp.abs(spec_est + 1e-12)
    ref_mag = jnp.abs(spec_ref + 1e-12)
    n_el = spec_est.size
    losses_mag = jnp.mean(jnp.square(est_mag ** 0.3 - ref_mag ** 0.3))
    diff = spec_est * est_mag ** -0.7 - spec_ref * ref_mag ** -0.7
    losses_ri = jnp.sum(jnp.abs(diff) ** 2) / n_el
    sisnr = _sisnr_log10(ref, est)
    return 70.0 * losses_mag + 30.0 * losses_ri - sisnr


# ---------------------------------------------------------------------------
# Model-level objectives ("loss_type" in the config)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """STFT/compression context needed to go spec -> audio inside losses."""

    n_fft: int = 512
    hop_length: int = 256
    window: Tuple[float, ...] = ()
    num_frames: int = 256
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    transform_type: str = "exponent"
    loss_type: str = "data_prediction_hybrid"
    l1_weight: float = 0.001
    pesq_weight: float = 0.0
    sample_rate: int = 16000

    @property
    def window_arr(self) -> jnp.ndarray:
        return jnp.asarray(np.asarray(self.window, np.float32))

    def spec_back(self, spec: Array) -> Array:
        return dsp.spec_back(spec, self.spec_factor, self.spec_abs_exponent,
                             self.transform_type)

    def to_audio(self, spec: Array, length: Optional[int] = None) -> Array:
        return dsp.istft(self.spec_back(spec), self.n_fft, self.hop_length,
                         self.window_arr, length=length)


def make_loss_config(window_type: str = "sqrthann", **kwargs) -> LossConfig:
    n_fft = kwargs.get("n_fft", 512)
    window = tuple(dsp.get_window(window_type, n_fft).tolist())
    return LossConfig(window=window, **kwargs)


def compute_loss(cfg: LossConfig, x_hat: Array, x: Array,
                 weights: Optional[Array] = None) -> Array:
    """Dispatch on cfg.loss_type (reference model.py:162-256).

    x_hat, x: complex spectrograms [B, C, F, T] (compressed domain).
    weights: optional [B] 0/1 mask excluding items from the batch mean
    (wrap-padded validation remainders).
    """
    if cfg.pesq_weight > 0.0 and cfg.loss_type not in (
            "data_prediction", "data_prediction_hybrid"):
        raise ValueError(
            "pesq_weight > 0 applies to data_prediction / "
            "data_prediction_hybrid only (reference model.py:179-185,213-218)."
        )

    def pesq_term(x_td, x_hat_td):
        """pesq_weight * mean torch_pesq-style PESQ loss on raw waveforms
        (reference model.py:179-185: self.pesq_loss(x_td, x_hat_td).mean())."""
        from fdbm_tpu.pesq_loss import pesq_loss as _pesq_loss

        per_item = _pesq_loss(x_td, x_hat_td, sample_rate=cfg.sample_rate)
        return cfg.pesq_weight * _wmean(per_item, weights)

    if cfg.loss_type == "data_prediction":
        b, c, f, t = x.shape
        losses_tf = jnp.square(jnp.abs(x_hat - x)) / (f * t)
        losses_tf = _wmean(0.5 * jnp.sum(losses_tf.reshape(b, -1), axis=-1),
                           weights)
        target_len = (cfg.num_frames - 1) * cfg.hop_length
        x_hat_td = cfg.to_audio(x_hat[:, 0], target_len)
        x_td = cfg.to_audio(x[:, 0], target_len)
        losses_l1 = jnp.abs(x_hat_td - x_td) / target_len
        losses_l1 = _wmean(0.5 * jnp.sum(losses_l1.reshape(b, -1), axis=-1),
                           weights)
        loss = losses_tf + cfg.l1_weight * losses_l1
        if cfg.pesq_weight > 0.0:
            loss = loss + pesq_term(x_td, x_hat_td)
        return loss

    if cfg.loss_type == "data_prediction_hybrid":
        b, c, f, t = x.shape
        x_nc = cfg.spec_back(x)
        x_hat_nc = cfg.spec_back(x_hat)
        x_mag = jnp.abs(x_nc + 1e-12)
        x_hat_mag = jnp.abs(x_hat_nc + 1e-12)
        losses_mag = _wmean(
            jnp.mean(jnp.square(x_mag ** 0.3 - x_hat_mag ** 0.3), axis=(1, 2, 3)),
            weights)
        diff = x_nc * x_mag ** -0.7 - x_hat_nc * x_hat_mag ** -0.7
        losses_ri = _wmean(
            jnp.sum(jnp.abs(diff) ** 2, axis=(1, 2, 3)) / (c * f * t), weights)
        x_hat_td = cfg.to_audio(x_hat[:, 0])
        x_td = cfg.to_audio(x[:, 0])
        sisnr = _sisnr_log10(x_td, x_hat_td, weights)
        loss = 70.0 * losses_mag + 30.0 * losses_ri - sisnr
        if cfg.pesq_weight > 0.0:
            loss = loss + pesq_term(x_td, x_hat_td)
        return loss

    if cfg.loss_type == "data_prediction_mel":
        losses_tf = _wmean(
            jnp.mean(jnp.square(jnp.abs(x_hat - x)), axis=(1, 2, 3)), weights) * 0.5
        target_len = (cfg.num_frames - 1) * cfg.hop_length
        x_hat_td = cfg.to_audio(x_hat[:, 0], target_len)
        x_td = cfg.to_audio(x[:, 0], target_len)
        losses_mel = mel_spectrogram_loss(x_hat_td, x_td,
                                          sample_rate=cfg.sample_rate,
                                          weights=weights, **MEL7)
        return losses_tf + 0.1 * losses_mel

    if cfg.loss_type == "data_prediction_melphase":
        losses_tf = _wmean(
            jnp.mean(jnp.square(jnp.abs(x_hat - x)), axis=(1, 2, 3)), weights) * 0.5
        target_len = (cfg.num_frames - 1) * cfg.hop_length
        x_hat_td = cfg.to_audio(x_hat[:, 0], target_len)
        x_td = cfg.to_audio(x[:, 0], target_len)
        losses_mel = mel_spectrogram_loss(x_hat_td, x_td,
                                          sample_rate=cfg.sample_rate,
                                          weights=weights, **MEL7)
        losses_phase = phase_loss(x_hat, x, weights)
        return losses_tf + 0.1 * losses_mel + 0.01 * losses_phase

    raise ValueError(f"Invalid loss type: {cfg.loss_type}")
