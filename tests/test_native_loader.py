"""Native C++ WAV loader: parity with the python path."""

import os

import numpy as np
import pytest

from fdbm_tpu.data import DataConfig, SpecsDataset
from fdbm_tpu.ops.native import (load_crop_pair_native, native_available,
                                 read_wav_native)
from fdbm_tpu.utils.audio import read_wav, write_wav

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native wavio lib not built")


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    paths = []
    for i, L in enumerate([3000, 8000]):
        x = np.clip(0.4 * rng.standard_normal(L), -0.99, 0.99).astype(np.float32)
        p = str(root / f"w{i}.wav")
        write_wav(p, x, 16000)
        paths.append(p)
    return paths


def test_native_read_matches_python(wavs):
    for p in wavs:
        nat, sr_n = read_wav_native(p)
        py, sr_p = read_wav(p)
        assert sr_n == sr_p
        np.testing.assert_allclose(nat, py[0], atol=1e-6)


def test_native_crop_pair_center(wavs):
    x, y = load_crop_pair_native(wavs[0], wavs[1], 2000, -1, "noisy")
    assert x.shape == y.shape == (2000,)
    assert abs(np.max(np.abs(y)) - 1.0) < 1e-5  # normalised by noisy max


def test_native_pad_short(wavs):
    x, y = load_crop_pair_native(wavs[0], wavs[0], 5000, -1, "not")
    py, _ = read_wav(wavs[0])
    pad = 5000 - 3000
    np.testing.assert_allclose(x[pad // 2 : pad // 2 + 3000], py[0], atol=1e-6)
    np.testing.assert_array_equal(x[: pad // 2], 0)


def test_dataset_uses_native_consistently(tmp_path):
    rng = np.random.default_rng(1)
    for kind in ("clean", "noisy"):
        os.makedirs(tmp_path / "train" / kind, exist_ok=True)
    x = np.clip(0.3 * rng.standard_normal(6000), -0.99, 0.99).astype(np.float32)
    write_wav(str(tmp_path / "train" / "clean" / "a.wav"), x, 16000)
    write_wav(str(tmp_path / "train" / "noisy" / "a.wav"), x * 0.8, 16000)
    cfg = DataConfig(base_dir=str(tmp_path), num_frames=16, hop_length=64,
                     n_fft=128)
    ds = SpecsDataset(cfg, "train", shuffle_spec=False)
    xi, yi = ds.load_item(0)
    assert xi.shape == (cfg.target_len,)
    # noisy-max normalisation: |y| peaks at 1
    assert abs(np.max(np.abs(yi)) - 1.0) < 1e-5
