"""Loss golden tests: torch oracles transcribe the reference formulas
(fdbm/model.py:162-256, fdbm/loss.py) and our jnp results must match."""

import numpy as np
import torch

import jax.numpy as jnp

from fdbm_tpu import dsp, losses

N_FFT, HOP, NFRAMES = 256, 128, 32
WINDOW = dsp.get_window("sqrthann", N_FFT)


def _cfg(loss_type):
    return losses.LossConfig(
        n_fft=N_FFT, hop_length=HOP, window=tuple(WINDOW.tolist()),
        num_frames=NFRAMES, loss_type=loss_type,
    )


def _specs(seed=0, b=2):
    rng = np.random.default_rng(seed)
    target_len = (NFRAMES - 1) * HOP
    xa = rng.standard_normal((b, target_len)).astype(np.float32) * 0.1
    ya = xa + 0.03 * rng.standard_normal((b, target_len)).astype(np.float32)
    w = jnp.asarray(WINDOW)
    X = dsp.spec_fwd(dsp.stft(jnp.asarray(xa), N_FFT, HOP, w))[:, None]
    Y = dsp.spec_fwd(dsp.stft(jnp.asarray(ya), N_FFT, HOP, w))[:, None]
    return X, Y


def _torch_spec_back(spec, factor=0.15, e=0.5):
    spec = spec / factor
    return spec.abs() ** (1 / e) * torch.exp(1j * spec.angle())


def _torch_to_audio(spec, length=None):
    return torch.istft(
        _torch_spec_back(spec), n_fft=N_FFT, hop_length=HOP,
        window=torch.from_numpy(WINDOW), center=True, length=length,
    )


def test_data_prediction_matches_torch_oracle():
    X, Y = _specs()
    x_hat_t = torch.from_numpy(np.asarray(Y))
    x_t = torch.from_numpy(np.asarray(X))
    B, C, F, T = x_t.shape
    losses_tf = (1 / (F * T)) * torch.square(torch.abs(x_hat_t - x_t))
    losses_tf = torch.mean(0.5 * torch.sum(losses_tf.reshape(B, -1), dim=-1))
    target_len = (NFRAMES - 1) * HOP
    xh_td = _torch_to_audio(x_hat_t.squeeze(1), target_len)
    x_td = _torch_to_audio(x_t.squeeze(1), target_len)
    losses_l1 = (1 / target_len) * torch.abs(xh_td - x_td)
    losses_l1 = torch.mean(0.5 * torch.sum(losses_l1.reshape(B, -1), dim=-1))
    ref = float(losses_tf + 0.001 * losses_l1)

    got = float(losses.compute_loss(_cfg("data_prediction"), Y, X))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_hybrid_matches_torch_oracle():
    X, Y = _specs(1)
    x_hat_t = torch.from_numpy(np.asarray(Y))
    x_t = torch.from_numpy(np.asarray(X))
    B, C, F, T = x_t.shape
    x_nc = _torch_spec_back(x_t)
    xh_nc = _torch_spec_back(x_hat_t)
    x_mag = torch.abs(x_nc + 1e-12)
    xh_mag = torch.abs(xh_nc + 1e-12)
    losses_mag = torch.mean(torch.square(x_mag.pow(0.3) - xh_mag.pow(0.3)))
    losses_ri = torch.square(
        torch.norm(x_nc / x_mag.pow(0.7) - xh_nc / xh_mag.pow(0.7), p=2)
    ) / (B * C * F * T)
    xh_td = _torch_to_audio(x_hat_t.squeeze(1))
    x_td = _torch_to_audio(x_t.squeeze(1))
    x_td_norm = (
        torch.sum(x_td * xh_td, dim=-1, keepdim=True) * x_td
        / (torch.sum(x_td.pow(2), dim=-1, keepdim=True) + 1e-12)
    )
    sisnr = torch.log10(
        (torch.sum(x_td_norm.pow(2), dim=-1, keepdim=True)
         / (torch.sum((xh_td - x_td_norm).pow(2), dim=-1, keepdim=True) + 1e-12)
         ).clamp(min=1e-12)
    ).mean()
    ref = float(70 * losses_mag + 30 * losses_ri - sisnr)

    got = float(losses.compute_loss(_cfg("data_prediction_hybrid"), Y, X))
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_phase_loss_matches_banded_matmul_oracle():
    X, Y = _specs(2)
    x_t = torch.from_numpy(np.asarray(X))
    y_t = torch.from_numpy(np.asarray(Y))
    nf, nt = x_t.shape[-2], x_t.shape[-1]
    GD = (torch.triu(torch.ones(nf, nf), 1) - torch.triu(torch.ones(nf, nf), 2)
          - torch.eye(nf))
    PTD = (torch.triu(torch.ones(nt, nt), 1) - torch.triu(torch.ones(nt, nt), 2)
           - torch.eye(nt))
    unwrap = lambda v: torch.abs(v - 2 * torch.pi * torch.round(v / (2 * torch.pi)))
    pg = torch.angle(y_t).squeeze(1)
    pr = torch.angle(x_t).squeeze(1)
    GD_r = torch.matmul(pr.permute(0, 2, 1), GD)
    GD_g = torch.matmul(pg.permute(0, 2, 1), GD)
    PTD_r = torch.matmul(pr, PTD)
    PTD_g = torch.matmul(pg, PTD)
    ref = float(
        torch.mean(unwrap(pr - pg)) + torch.mean(unwrap(GD_r - GD_g))
        + torch.mean(unwrap(PTD_r - PTD_g))
    )
    got = float(losses.phase_loss(Y, X))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_si_sdr_loss_matches_torch_oracle():
    rng = np.random.default_rng(3)
    ref_sig = rng.standard_normal((2, 4000)).astype(np.float32)
    est_sig = ref_sig + 0.1 * rng.standard_normal((2, 4000)).astype(np.float32)
    refs = torch.from_numpy(ref_sig).reshape(2, 1, -1).permute(0, 2, 1)
    ests = torch.from_numpy(est_sig).reshape(2, 1, -1).permute(0, 2, 1)
    eps = 1e-8
    _r = refs - refs.mean(dim=1, keepdim=True)
    _e = ests - ests.mean(dim=1, keepdim=True)
    rp = (_r ** 2).sum(dim=-2) + eps
    roe = (_e * _r).sum(dim=-2) + eps
    scale = (roe / rp).unsqueeze(1)
    e_true = scale * _r
    e_res = _e - e_true
    sdr = -10 * torch.log10((e_true ** 2).sum(dim=1) / (e_res ** 2).sum(dim=1) + eps)
    ref = float(sdr.mean())
    got = float(losses.si_sdr_loss(jnp.asarray(ref_sig), jnp.asarray(est_sig)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_multiscale_stft_loss_finite_and_zero_on_identical():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    assert float(losses.multiscale_stft_loss(x, x, (512, 256), (128, 64))) == 0.0
    y = x + 0.1
    v = float(losses.multiscale_stft_loss(x, y, (512, 256), (128, 64)))
    assert np.isfinite(v) and v > 0


def test_mel_filters_properties():
    fb = losses.mel_filters(16000, 512, 80)
    assert fb.shape == (80, 257)
    assert np.all(fb >= 0)
    # every filter has some support; each is a single triangle
    assert np.all(fb.sum(axis=1) > 0)
    # Slaney norm: peak value of each filter = 2/(band width in Hz)
    mel_pts = losses._mel_to_hz(
        np.linspace(losses._hz_to_mel(0.0), losses._hz_to_mel(8000.0), 82)
    )
    widths = mel_pts[2:] - mel_pts[:-2]
    peaks = fb.max(axis=1)
    # discretisation: peak <= 2/width, and close for wide filters
    assert np.all(peaks <= 2.0 / widths + 1e-6)


def test_mel_loss_runs():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32))
    y = x + 0.05
    v = float(losses.mel_spectrogram_loss(x, y, n_mels=(20, 40),
                                          win_lengths=(256, 512),
                                          hop_lengths=(64, 128)))
    assert np.isfinite(v) and v > 0


def test_melphase_loss_dispatch():
    X, Y = _specs(6)
    v = float(losses.compute_loss(_cfg("data_prediction_melphase"), Y, X))
    assert np.isfinite(v) and v > 0


def test_spec_mag_sisnr_loss():
    rng = np.random.default_rng(7)
    ref_sig = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    est_sig = ref_sig + 0.05 * jnp.asarray(
        rng.standard_normal((2, 4000)).astype(np.float32))
    v = float(losses.spec_mag_sisnr_loss(est_sig, ref_sig, N_FFT, HOP,
                                         jnp.asarray(WINDOW)))
    assert np.isfinite(v)
