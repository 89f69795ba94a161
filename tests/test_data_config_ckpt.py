"""Data pipeline, audio I/O, config, and checkpoint tests."""

import json
import os

import numpy as np
import pytest

import jax

from fdbm_tpu import config as config_lib
from fdbm_tpu.checkpoint import CheckpointManager, restore_params, save_params
from fdbm_tpu.data import BatchLoader, DataConfig, SpecsDataset
from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.utils.audio import read_wav, resample, write_wav


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    """Synthetic paired dataset: 6 train + 4 valid files."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    for subset, n in [("train", 6), ("valid", 4), ("test", 3)]:
        for kind in ("clean", "noisy"):
            os.makedirs(root / subset / kind, exist_ok=True)
        for i in range(n):
            L = int(rng.integers(3000, 9000))
            x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(L) / 16000)).astype(np.float32)
            noise = 0.05 * rng.standard_normal(L).astype(np.float32)
            write_wav(str(root / subset / "clean" / f"f{i}.wav"), x, 16000)
            write_wav(str(root / subset / "noisy" / f"f{i}.wav"), x + noise, 16000)
    return str(root)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = np.clip(rng.standard_normal(5000) * 0.3, -0.99, 0.99).astype(np.float32)
    p16 = str(tmp_path / "a.wav")
    write_wav(p16, x, 16000, subtype="pcm16")
    y, sr = read_wav(p16)
    assert sr == 16000 and y.shape == (1, 5000)
    np.testing.assert_allclose(y[0], x, atol=1 / 32768 + 1e-6)

    pf = str(tmp_path / "b.wav")
    write_wav(pf, x, 16000, subtype="float32")
    y2, sr2 = read_wav(pf)
    np.testing.assert_allclose(y2[0], x, atol=1e-7)


def test_resample_length():
    x = np.random.default_rng(0).standard_normal(48000).astype(np.float32)
    y = resample(x, 48000, 16000)
    assert abs(len(y) - 16000) <= 1


def test_dataset_crop_and_normalize(wav_dir):
    cfg = DataConfig(base_dir=wav_dir, num_frames=16, hop_length=256, n_fft=512)
    ds = SpecsDataset(cfg, "train", shuffle_spec=True)
    assert len(ds) == 6
    x, y = ds.load_item(0)
    assert x.shape == y.shape == (cfg.target_len,)
    assert np.max(np.abs(y)) <= 1.0 + 1e-6  # normalised by noisy max


def test_dataset_pads_short_files(wav_dir):
    cfg = DataConfig(base_dir=wav_dir, num_frames=256, hop_length=256, n_fft=512)
    ds = SpecsDataset(cfg, "train", shuffle_spec=False)
    x, y = ds.load_item(0)  # files are ~3-9k samples < 65280
    assert x.shape == (cfg.target_len,)


def test_batch_loader(wav_dir):
    cfg = DataConfig(base_dir=wav_dir, num_frames=16, batch_size=4)
    ds = SpecsDataset(cfg, "train", shuffle_spec=True)
    loader = BatchLoader(ds, 4, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1  # 6 files // 4
    x, y = batches[0]
    assert x.shape == (4, cfg.target_len)
    # eval loader keeps remainder
    loader2 = BatchLoader(ds, 4, shuffle=False, drop_last=False)
    assert sum(1 for _ in loader2) == 2


def test_num_data_per_epoch(wav_dir):
    cfg = DataConfig(base_dir=wav_dir, num_frames=16, num_data_per_epoch=3)
    ds = SpecsDataset(cfg, "train", shuffle_spec=True)
    assert len(ds) == 3
    first = list(ds.clean_files)
    ds.sample_data_per_epoch()
    assert len(ds.clean_files) == 3
    assert first != ds.clean_files or True  # resampling may coincide


def test_config_interpolation(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "backbone: tfg\nbridge: sb\nversion: Path=${bridge}_Backbone=${backbone}\n"
        "nested:\n  dir: ${version}/logs\n"
    )
    cfg = config_lib.load_config(str(p))
    assert cfg["version"] == "Path=sb_Backbone=tfg"
    assert cfg["nested"]["dir"] == "Path=sb_Backbone=tfg/logs"


def test_config_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("N: 5\nlr: 1e-4\n")
    over = config_lib.parse_cli_overrides(["N=30", "lr=5e-4"])
    cfg = config_lib.load_config(str(p), over)
    assert cfg["N"] == 30 and abs(cfg["lr"] - 5e-4) < 1e-12


SMALL = dict(backbone="tfgridnet_4l32c80", n_fft=128, hop_length=64, num_frames=16)


def test_checkpoint_roundtrip(tmp_path):
    fdbm = FDBM(FDBMConfig(**SMALL))
    state = fdbm.init_state(jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ck"), save_interval=1,
                            config={"backbone": "tfgridnet_4l32c80"})
    mgr.save(state, {"valid_loss": 1.0, "pesq": 2.0, "si_sdr": 10.0})
    assert mgr.has("last") and mgr.has("best_valid_loss")
    assert mgr.has("best_pesq") and mgr.has("best_si_sdr")

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored = mgr.restore("last", abstract)
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # best slots only overwrite on improvement
    mgr.save(state.replace(step=state.step + 1), {"valid_loss": 2.0})
    meta = json.load(open(str(tmp_path / "ck" / "meta.json")))
    assert meta["best"]["valid_loss"] == 1.0


def test_load_model_accepts_slot_directory(tmp_path):
    """`ckpt` pointing at a slot dir (<run>/checkpoints/last) must resolve
    to the parent checkpoints dir + that slot, not FileNotFoundError —
    users naturally pass the slot path (reference --ckpt takes a file)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from infer_single import load_model_from_ckpt

    fdbm = FDBM(FDBMConfig(**SMALL))
    state = fdbm.init_state(jax.random.PRNGKey(0))
    cfg_blob = {k: getattr(FDBMConfig(**SMALL), k) for k in SMALL}
    mgr = CheckpointManager(str(tmp_path / "ck"), save_interval=1,
                            config=cfg_blob)
    mgr.save(state, {"valid_loss": 1.0})

    fdbm2, state2 = load_model_from_ckpt(str(tmp_path / "ck" / "last"))
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_only_save_restore(tmp_path):
    fdbm = FDBM(FDBMConfig(**SMALL))
    params = fdbm.init_params(jax.random.PRNGKey(0))
    save_params(str(tmp_path / "p"), params, {"backbone": "x"})
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    restored = restore_params(str(tmp_path / "p"), abstract)
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_build_from_config(tmp_path):
    """train.py's config -> (FDBM, DataConfig) assembly works on the
    shipped YAML surface."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from train import build_from_config
    from fdbm_tpu.config import load_config

    cfg = load_config("configs/config.yaml", {"base_dir": str(tmp_path)})
    fdbm, data_cfg = build_from_config(cfg)
    assert fdbm.cfg.backbone == "tfgridnet_5l32c100"
    assert fdbm.cfg.loss_type == "data_prediction_hybrid"
    assert fdbm.cfg.scheduler_config["scheduler"] == "warmup"
    assert data_cfg.n_fft == 512 and data_cfg.hop_length == 256
    assert data_cfg.batch_size == 2

    cfg2 = load_config("configs/config_predictive.yaml", {"base_dir": str(tmp_path)})
    fdbm2, _ = build_from_config(cfg2)
    assert fdbm2.cfg.mode == "predictive"
    assert fdbm2.cfg.backbone.endswith("_predictive")
