"""Training loop: data-parallel fit with logging, eval, and checkpoints.

Equivalent of the reference's Lightning Trainer usage (train.py:52-166):

* data-parallel jitted train step over a 1-D device mesh (parallel/mesh.py)
  instead of DDP/NCCL;
* scalar logging to TensorBoard (if available) + metrics.jsonl, every
  ``log_every_n_steps`` (reference logs every 10, train.py:159);
* code snapshotting into ``<log_dir>/code`` at run start
  (reference train.py:115-123);
* per-epoch full-utterance evaluation with PESQ (gated on the optional
  `pesq` package) / SI-SDR / ESTOI, sharded over processes
  (reference model.py:292-354), with sample-wav dumps for the first 3
  files on process 0;
* five-slot checkpointing (checkpoint.py) and resume from 'last'.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from fdbm_tpu.checkpoint import CheckpointManager
from fdbm_tpu.data import BatchLoader, DataConfig, SpecsDataset
from fdbm_tpu.infer import BucketedEnhancer
from fdbm_tpu.model import FDBM
from fdbm_tpu.parallel import (make_mesh, make_parallel_train_step,
                               make_parallel_valid_step, shard_batch)
from fdbm_tpu.utils.audio import read_wav, resample, write_wav
from fdbm_tpu.utils import metrics as metrics_lib


def snapshot_code(log_dir: str) -> None:
    """Copy the framework source into the run dir (train.py:115-123)."""
    code_dir = os.path.join(log_dir, "code")
    os.makedirs(code_dir, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in os.listdir(repo):
        src = os.path.join(repo, name)
        if name.endswith((".py", ".yaml")) and os.path.isfile(src):
            shutil.copy2(src, code_dir)
    pkg_src = os.path.join(repo, "fdbm_tpu")
    pkg_dst = os.path.join(code_dir, "fdbm_tpu")
    if os.path.isdir(pkg_src):
        shutil.copytree(pkg_src, pkg_dst, dirs_exist_ok=True,
                        ignore=shutil.ignore_patterns("__pycache__"))


class MetricsLogger:
    """TensorBoard (optional) + JSONL scalar logger on process 0."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self) -> None:
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def evaluate_files(
    fdbm: FDBM,
    params,
    valid_set: SpecsDataset,
    num_eval_files: int,
    key: jax.Array,
    sample_dir: Optional[str] = None,
    epoch: int = 0,
    sampler_batch: int = 4,
) -> Tuple[Dict[str, float], Dict[str, int]]:
    """Full-utterance eval: enhance first N valid files, compute metrics.

    Returns ``(metrics, counts)`` — per-metric local means plus the
    per-metric item counts the multi-host gather weighs them by.

    Files are sharded over processes (model.py:297-312); single-process
    here means we take them all.  Files stream through in bounded chunks
    (read -> enhance -> score -> release) so host memory stays flat for
    arbitrarily large eval sets — the reference streams file-by-file
    (fdbm/model.py:317-331); we stream a few sampler batches at a time to
    keep the device saturated.
    """
    pi, pc = jax.process_index(), jax.process_count()
    clean_files = valid_set.clean_files_global[:num_eval_files][pi::pc]
    noisy_files = valid_set.noisy_files_global[:num_eval_files][pi::pc]
    if not clean_files:
        return {}, {}

    enhancer = BucketedEnhancer(fdbm, params, batch_size=sampler_batch)
    pesq_vals, sisdr_vals, estoi_vals = [], [], []
    chunk = max(1, 4 * sampler_batch)
    for s in range(0, len(clean_files), chunk):
        audios, cleans = [], []
        for cf, nf in zip(clean_files[s : s + chunk], noisy_files[s : s + chunk]):
            x, sr_x = read_wav(cf)
            y, sr_y = read_wav(nf)
            assert sr_x == sr_y, "Sample rates of clean and noisy files do not match!"
            x, y = x[0], y[0]
            if sr_x != 16000:
                x = resample(x, sr_x, 16000)
                y = resample(y, sr_y, 16000)
            cleans.append(x)
            audios.append(y)

        key, sub = jax.random.split(key)
        enhanced = enhancer.enhance_many(audios, sub)

        for j, (x, x_hat) in enumerate(zip(cleans, enhanced)):
            i = s + j  # global index within this process's shard
            if np.isnan(x_hat).any():
                continue
            L = min(len(x), len(x_hat))
            sisdr_vals.append(metrics_lib.si_sdr(x[:L], x_hat[:L]))
            p = metrics_lib.pesq_wb(16000, x[:L], x_hat[:L])
            if p is not None:
                pesq_vals.append(p)
            e = metrics_lib.estoi(x[:L], x_hat[:L], 16000)
            if np.isfinite(e):
                estoi_vals.append(e)
            if sample_dir and i < 3 and pi == 0:
                base = os.path.splitext(os.path.basename(clean_files[i]))[0]
                write_wav(os.path.join(sample_dir, f"{base}_epoch{epoch:03d}_enh.wav"),
                          x_hat, 16000)
                if epoch == 0:
                    write_wav(os.path.join(sample_dir, f"{base}_noisy.wav"), audios[j], 16000)
                    write_wav(os.path.join(sample_dir, f"{base}_clean.wav"), x, 16000)

    out: Dict[str, float] = {}
    counts: Dict[str, int] = {}
    if sisdr_vals:
        out["si_sdr"] = float(np.mean(sisdr_vals))
        counts["si_sdr"] = len(sisdr_vals)
    if pesq_vals:
        out["pesq"] = float(np.mean(pesq_vals))
        counts["pesq"] = len(pesq_vals)
    if estoi_vals:
        out["estoi"] = float(np.mean(estoi_vals))
        counts["estoi"] = len(estoi_vals)
    return out, counts


class Trainer:
    def __init__(
        self,
        fdbm: FDBM,
        data_cfg: DataConfig,
        log_dir: str,
        max_steps: int = 1_000_000,
        max_epochs: int = 10_000,
        num_eval_files: int = 20,
        save_ckpt_interval: int = 20000,
        log_every_n_steps: int = 10,
        n_devices: Optional[int] = None,
        seed: int = 0,
        config_blob: Optional[Dict[str, Any]] = None,
        snapshot: bool = True,
        profile_steps: Optional[tuple] = None,
    ):
        self.fdbm = fdbm
        self.data_cfg = data_cfg
        self.log_dir = log_dir
        self.max_steps = max_steps
        self.max_epochs = max_epochs
        self.num_eval_files = num_eval_files
        self.log_every = log_every_n_steps
        self.seed = seed
        os.makedirs(log_dir, exist_ok=True)
        self.sample_dir = os.path.join(log_dir, "valid_samples")
        os.makedirs(self.sample_dir, exist_ok=True)
        if snapshot:
            snapshot_code(log_dir)
        self.mesh = make_mesh(n_devices, batch_size=data_cfg.batch_size)
        self.train_step = make_parallel_train_step(fdbm, self.mesh)
        self.valid_step = make_parallel_valid_step(fdbm, self.mesh)
        self.ckpt = CheckpointManager(
            os.path.join(log_dir, "checkpoints"),
            save_interval=save_ckpt_interval, config=config_blob or {},
        )
        self.logger = MetricsLogger(log_dir)
        # (start_step, end_step) window traced with jax.profiler
        self.profile_steps = profile_steps

    def fit(self, resume: bool = True, init_params=None,
            resume_from: Optional[str] = None) -> None:
        """Train. ``resume_from`` restores from an external checkpoint dir
        (the reference's `--ckpt` -> trainer.fit(ckpt_path), train.py:64,166);
        otherwise ``resume=True`` continues this run's own 'last' slot."""
        fdbm = self.fdbm
        key = jax.random.PRNGKey(self.seed)
        key, init_key = jax.random.split(key)
        state = fdbm.init_state(init_key)
        if init_params is not None:
            state = state.replace(
                params=init_params,
                ema_params=jax.tree_util.tree_map(lambda p: p, init_params),
            )
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        if resume_from:
            src = CheckpointManager(resume_from)
            if not src.has("last"):
                raise FileNotFoundError(f"No 'last' checkpoint in {resume_from}")
            state = src.restore("last", abstract)
            print(f"resumed from {resume_from} at step {int(state.step)}")
        elif resume and self.ckpt.has("last"):
            state = self.ckpt.restore("last", abstract)
            print(f"resumed from step {int(state.step)}")

        # Multi-host: each process loads a disjoint [pi::pc] file shard and
        # a batch_size/pc slice of the global batch (assembled in
        # shard_batch via make_array_from_process_local_data); num_batches
        # keeps every host dispatching the same number of collective steps.
        pi, pc = jax.process_index(), jax.process_count()
        if self.data_cfg.batch_size % pc != 0:
            raise ValueError(
                f"global batch_size {self.data_cfg.batch_size} must divide "
                f"by process_count {pc}")
        local_bs = self.data_cfg.batch_size // pc
        train_set = SpecsDataset(self.data_cfg, "train", shuffle_spec=True,
                                 seed=self.seed, shard_by_process=pc > 1)
        valid_set = SpecsDataset(self.data_cfg, "valid", shuffle_spec=False,
                                 seed=self.seed, shard_by_process=pc > 1)

        def _train_batches():
            return (train_set.effective_global_len // pc) // local_bs

        def _valid_batches():
            n = valid_set.effective_global_len
            per_host = (n + pc - 1) // pc  # ceil: largest host shard
            return (per_host + local_bs - 1) // local_bs

        train_loader = BatchLoader(train_set, local_bs,
                                   shuffle=True, drop_last=True, seed=self.seed,
                                   num_batches=_train_batches())
        # drop_last=False pads the remainder batch by wrapping, keeping jit
        # shapes static while covering every validation item; the mask
        # excludes the wrapped duplicates from the loss.
        valid_loader = BatchLoader(valid_set, local_bs,
                                   shuffle=False, drop_last=False, seed=self.seed,
                                   yield_mask=True, num_batches=_valid_batches())

        step = int(state.step)
        epoch = 0
        t_last = time.perf_counter()
        while step < self.max_steps and epoch < self.max_epochs:
            train_set.sample_data_per_epoch()
            for batch in train_loader:
                key, sub = jax.random.split(key)
                if self.profile_steps and step + 1 == self.profile_steps[0]:
                    jax.profiler.start_trace(os.path.join(self.log_dir, "profile"))
                state, metrics = self.train_step(state, shard_batch(self.mesh, batch), sub)
                step = int(state.step)
                if self.profile_steps and step == self.profile_steps[1]:
                    jax.tree_util.tree_map(
                        lambda x: x.block_until_ready(),
                        metrics)
                    jax.profiler.stop_trace()
                if step % self.log_every == 0:
                    now = time.perf_counter()
                    scalars = {k: float(v) for k, v in metrics.items()}
                    scalars["steps_per_sec"] = self.log_every / (now - t_last)
                    t_last = now
                    self.logger.log(step, scalars)
                if step >= self.max_steps:
                    break

            # ---- validation epoch ----
            # Per-batch losses already exclude wrap-padded duplicates (the
            # mask); the epoch mean weights each batch by its real item
            # count so valid_loss is invariant to the batch-size remainder.
            val_losses, val_counts = [], []
            for batch in valid_loader:
                key, sub = jax.random.split(key)
                n_real = float(batch[2].sum())
                val_losses.append(float(self.valid_step(
                    state, shard_batch(self.mesh, batch), sub)))
                val_counts.append(n_real)
            val_metrics: Dict[str, float] = {}
            val_metric_counts: Dict[str, int] = {}
            if val_losses and sum(val_counts) > 0:
                val_metrics["valid_loss"] = float(
                    np.average(val_losses, weights=val_counts))
                val_metric_counts["valid_loss"] = int(sum(val_counts))
            if self.num_eval_files > 0:
                key, sub = jax.random.split(key)
                eval_metrics, eval_counts = evaluate_files(
                    fdbm, state.ema_params, valid_set, self.num_eval_files,
                    sub, sample_dir=self.sample_dir, epoch=epoch)
                val_metrics.update(eval_metrics)
                val_metric_counts.update(eval_counts)
            # sync_dist equivalent: item-count-weighted mean across hosts.
            # Every process calls the gather unconditionally with the fixed
            # VALID_METRIC_SCHEMA — a host whose eval shard was empty (or
            # whose PESQ all failed) contributes count-0 entries instead of
            # skipping the collective, which would desync process_allgather.
            from fdbm_tpu.parallel.distributed import (VALID_METRIC_SCHEMA,
                                                       all_gather_host_metrics)

            val_metrics = all_gather_host_metrics(
                val_metrics, val_metric_counts, schema=VALID_METRIC_SCHEMA)
            if val_metrics:
                self.logger.log(step, val_metrics)
            self.ckpt.save(state, val_metrics)
            epoch += 1

        self.ckpt.save(state)
        self.logger.close()
