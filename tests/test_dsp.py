"""Golden-value tests for the spectral front-end against torch (CPU).

torch.stft / torch.istft are the behaviour spec (reference uses them at
fdbm/data_module.py:223-229); torch is available CPU-only in this image.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from fdbm_tpu import dsp


def _torch_stft(x, n_fft, hop, window):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.from_numpy(window),
        center=True,
        return_complex=True,
    ).numpy()


def _torch_istft(spec, n_fft, hop, window, length=None):
    return torch.istft(
        torch.from_numpy(spec),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.from_numpy(window),
        center=True,
        length=length,
    ).numpy()


@pytest.mark.parametrize("n_fft,hop,wtype", [(512, 256, "sqrthann"), (512, 128, "hann"),
                                             (256, 64, "sqrthann")])
def test_stft_matches_torch(n_fft, hop, wtype):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16000)).astype(np.float32)
    w = dsp.get_window(wtype, n_fft)

    ref = _torch_stft(x, n_fft, hop, w)
    got = np.asarray(dsp.stft(jnp.asarray(x), n_fft, hop, jnp.asarray(w)))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("n_fft,hop,wtype,length", [
    (512, 256, "sqrthann", 16000),
    (512, 256, "sqrthann", None),
    (512, 128, "hann", 15555),
])
def test_istft_matches_torch(n_fft, hop, wtype, length):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16000,)).astype(np.float32)
    w = dsp.get_window(wtype, n_fft)
    spec = _torch_stft(x, n_fft, hop, w)

    ref = _torch_istft(spec, n_fft, hop, w, length)
    got = np.asarray(dsp.istft(jnp.asarray(spec), n_fft, hop, jnp.asarray(w), length=length))

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 65280)).astype(np.float32)
    w = jnp.asarray(dsp.get_window("sqrthann", 512))
    spec = dsp.stft(jnp.asarray(x), 512, 256, w)
    assert spec.shape == (3, 257, 256)  # 257 bins x 256 frames (train crop)
    back = dsp.istft(spec, 512, 256, w, length=65280)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_spec_fwd_back_matches_torch_formula():
    rng = np.random.default_rng(3)
    z = (rng.standard_normal((4, 257, 16)) + 1j * rng.standard_normal((4, 257, 16))).astype(
        np.complex64
    )
    zt = torch.from_numpy(z)
    e, factor = 0.5, 0.15
    ref_fwd = (zt.abs() ** e * torch.exp(1j * zt.angle()) * factor).numpy()
    got_fwd = np.asarray(dsp.spec_fwd(jnp.asarray(z), factor, e))
    np.testing.assert_allclose(got_fwd, ref_fwd, atol=1e-5, rtol=1e-4)

    back = np.asarray(dsp.spec_back(jnp.asarray(got_fwd), factor, e))
    np.testing.assert_allclose(back, z, atol=1e-4, rtol=1e-4)


def test_spec_fwd_zero_is_zero():
    z = jnp.zeros((2, 5, 5), jnp.complex64)
    out = dsp.spec_fwd(z)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_array_equal(np.asarray(out), 0)


def test_pad_spec():
    x = jnp.ones((1, 1, 257, 100), jnp.complex64)
    out = dsp.pad_spec(x)
    assert out.shape == (1, 1, 257, 128)
    np.testing.assert_array_equal(np.asarray(out[..., 100:]), 0)
    # already multiple of 64: unchanged
    y = jnp.ones((1, 1, 257, 128), jnp.complex64)
    assert dsp.pad_spec(y).shape == y.shape


def test_num_frames_for_length():
    # train crop: (256-1)*256 samples -> 256 frames
    assert dsp.num_frames_for_length(65280, 512, 256) == 256
