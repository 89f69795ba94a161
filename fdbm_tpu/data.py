"""Host-side data pipeline: paired clean/noisy wavs -> batched audio crops.

Capability parity with the reference Specs dataset / SpecsDataModule
(fdbm/data_module.py:22-247), redesigned for TPU input pipelines:

* Workers only read wavs, crop/pad, and normalise — the STFT + spectral
  compression run **inside the jitted train step on device** (the reference
  does them on CPU DataLoader workers).  Raw audio batches are smaller than
  complex spectrograms, so this also halves host->device bytes.
* A thread-pool prefetcher keeps a bounded queue of ready batches so the
  TPU never waits on file IO.

Directory layout (format='default'): {base_dir}/{subset}/clean|noisy/**/*.wav
with subset in train/valid/test (reference data_module.py:29-34).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from glob import glob
from os.path import join
from typing import Iterator, List, Optional, Tuple

import numpy as np

from fdbm_tpu.utils.audio import read_wav


@dataclasses.dataclass
class DataConfig:
    base_dir: str
    format: str = "default"
    batch_size: int = 8
    n_fft: int = 512
    hop_length: int = 256
    num_frames: int = 256
    window: str = "sqrthann"
    num_workers: int = 4
    dummy: bool = False
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    normalize: str = "noisy"
    transform_type: str = "exponent"
    num_data_per_epoch: Optional[int] = None

    @property
    def target_len(self) -> int:
        # formula applies for center=True (reference data_module.py:58)
        return (self.num_frames - 1) * self.hop_length


def _paired_files(base_dir: str, subset: str) -> Tuple[List[str], List[str]]:
    clean = sorted(glob(join(base_dir, subset, "clean", "*.wav"))) + sorted(
        glob(join(base_dir, subset, "clean", "**", "*.wav"))
    )
    noisy = sorted(glob(join(base_dir, subset, "noisy", "*.wav"))) + sorted(
        glob(join(base_dir, subset, "noisy", "**", "*.wav"))
    )
    return clean, noisy


class SpecsDataset:
    """Paired dataset yielding normalised audio crops (x, y) [target_len].

    ``shard_by_process=True`` gives each host a disjoint ``[pi::pc]`` slice
    of the (identically seeded, so globally agreed) epoch file list — the
    multi-host equivalent of DDP's DistributedSampler. ``global_len``
    reports the pre-shard size so hosts can agree on batch counts.
    """

    def __init__(self, cfg: DataConfig, subset: str, shuffle_spec: bool,
                 seed: int = 0, shard_by_process: bool = False):
        if cfg.format != "default":
            raise NotImplementedError(f"Directory format {cfg.format} unknown!")
        self.cfg = cfg
        self.subset = subset
        self.shuffle_spec = shuffle_spec
        self.shard_by_process = shard_by_process
        self.clean_files_all, self.noisy_files_all = _paired_files(cfg.base_dir, subset)
        if len(self.clean_files_all) != len(self.noisy_files_all):
            raise ValueError(
                f"{subset}: {len(self.clean_files_all)} clean vs "
                f"{len(self.noisy_files_all)} noisy files"
            )
        self.rng = np.random.default_rng(seed)
        self.clean_files: List[str] = []
        self.noisy_files: List[str] = []
        self.global_len = 0
        self.sample_data_per_epoch()

    def sample_data_per_epoch(self) -> None:
        n = self.cfg.num_data_per_epoch
        if n is None:
            clean = self.clean_files_all
            noisy = self.noisy_files_all
        else:
            idx = self.rng.choice(len(self.clean_files_all), size=n, replace=False)
            clean = [self.clean_files_all[i] for i in idx]
            noisy = [self.noisy_files_all[i] for i in idx]
        self.global_len = len(clean)
        # pre-shard lists (used by eval-file sharding, which slices
        # [:num_eval_files] of the *global* list before process-sharding)
        self.clean_files_global = clean
        self.noisy_files_global = noisy
        if self.shard_by_process:
            import jax

            pi, pc = jax.process_index(), jax.process_count()
            clean, noisy = clean[pi::pc], noisy[pi::pc]
        self.clean_files = clean
        self.noisy_files = noisy

    def __len__(self) -> int:
        n = len(self.clean_files)
        return max(1, n // 200) if self.cfg.dummy and n else n

    @property
    def effective_global_len(self) -> int:
        """Pre-shard length with the dummy /200 shrink applied — the number
        all hosts use to agree on per-epoch batch counts."""
        n = self.global_len
        return max(1, n // 200) if self.cfg.dummy and n else n

    def load_item(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        target_len = self.cfg.target_len
        # Fast path: fused native decode+crop+normalise (GIL-free C++).
        native = self._load_item_native(i, target_len)
        if native is not None:
            return native
        x, _ = read_wav(self.clean_files[i])
        y, _ = read_wav(self.noisy_files[i])
        x, y = x[0], y[0]
        current_len = x.shape[-1]
        pad = max(target_len - current_len, 0)
        if pad == 0:
            if self.shuffle_spec:
                start = int(self.rng.uniform(0, current_len - target_len))
            else:
                start = int((current_len - target_len) / 2)
            x = x[start : start + target_len]
            y = y[start : start + target_len]
        else:
            x = np.pad(x, (pad // 2, pad // 2 + pad % 2))
            y = np.pad(y, (pad // 2, pad // 2 + pad % 2))

        normalize = self.cfg.normalize
        if normalize == "noisy":
            normfac = np.max(np.abs(y))
        elif normalize == "clean":
            normfac = np.max(np.abs(x))
        elif normalize == "not":
            normfac = 1.0
        elif normalize == "std":
            normfac = np.std(y)
        else:
            raise ValueError(f"Unknown normalize mode {normalize}")
        if normfac == 0:
            normfac = 1.0
        return (x / normfac).astype(np.float32), (y / normfac).astype(np.float32)

    def _load_item_native(self, i: int, target_len: int):
        try:
            from fdbm_tpu.ops.native import load_crop_pair_native, native_available
            from fdbm_tpu.ops.native.wavio import get_lib
        except Exception:
            return None
        if not native_available():
            return None
        # Random crop start must come from the same host RNG regardless of
        # which path loads the data.
        import ctypes

        lib = get_lib()
        sr = ctypes.c_int()
        ch = ctypes.c_int()
        frames = ctypes.c_longlong()
        bits = ctypes.c_int()
        if lib.wav_info(self.clean_files[i].encode(), ctypes.byref(sr),
                        ctypes.byref(ch), ctypes.byref(frames),
                        ctypes.byref(bits)) != 0:
            return None
        current_len = int(frames.value)
        if current_len > target_len and self.shuffle_spec:
            start = int(self.rng.uniform(0, current_len - target_len))
        else:
            start = -1  # centre crop / pad
        return load_crop_pair_native(
            self.clean_files[i], self.noisy_files[i], target_len, start,
            self.cfg.normalize)


class BatchLoader:
    """Thread-prefetched batch iterator over a SpecsDataset.

    Yields (x, y) float32 arrays [B, target_len]; drops the last partial
    batch in training (static shapes for jit), keeps it padded-by-repeat in
    eval so every item is seen.
    """

    def __init__(self, dataset: SpecsDataset, batch_size: int, shuffle: bool,
                 num_workers: int = 4, drop_last: bool = True, seed: int = 0,
                 yield_mask: bool = False, num_batches: Optional[int] = None):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.yield_mask = yield_mask
        # Exact per-epoch batch count (multi-host lockstep): truncates or
        # wrap-pads (mask 0) so every host dispatches the same number of
        # collective steps even when dataset shards differ by one item.
        self.num_batches = num_batches
        self.epoch_rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        if self.num_batches is not None:
            return self.num_batches
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self.epoch_rng.shuffle(order)
        batches = []
        for s in range(0, n, self.batch_size):
            idx = order[s : s + self.batch_size]
            n_real = len(idx)
            if n_real < self.batch_size:
                if self.drop_last and self.num_batches is None:
                    continue
                # wrap-pad to the full batch (works even when the dataset
                # is smaller than one batch)
                extra = np.resize(order, self.batch_size - n_real)
                idx = np.concatenate([idx, extra])
            batches.append((idx, n_real))
        if self.num_batches is not None:
            batches = batches[: self.num_batches]
            if n == 0 and self.num_batches > 0:
                raise ValueError("num_batches > 0 requires a non-empty dataset")
            while len(batches) < self.num_batches:
                # all-padding batches keep hosts in lockstep; mask == 0
                batches.append((np.resize(order, self.batch_size), 0))

        q: "queue.Queue" = queue.Queue(maxsize=4)
        stop = threading.Event()

        def worker():
            from concurrent.futures import ThreadPoolExecutor

            # Threads scale because the native decode/crop path releases
            # the GIL (fdbm_tpu/ops/native/wavio.cc).
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                try:
                    for idx, n_real in batches:
                        if stop.is_set():
                            return
                        items = list(pool.map(self.ds.load_item, map(int, idx)))
                        xs, ys = zip(*items)
                        batch = (np.stack(xs), np.stack(ys))
                        if self.yield_mask:
                            # 1 for real items, 0 for wrap-padded duplicates
                            mask = (np.arange(len(idx)) < n_real).astype(np.float32)
                            batch = batch + (mask,)
                        q.put(batch)
                finally:
                    q.put(None)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                yield item
        finally:
            stop.set()


def make_loaders(cfg: DataConfig, seed: int = 0):
    """(train_loader, valid_loader) mirroring SpecsDataModule.setup('fit')."""
    train_set = SpecsDataset(cfg, "train", shuffle_spec=True, seed=seed)
    valid_set = SpecsDataset(cfg, "valid", shuffle_spec=False, seed=seed)
    train_loader = BatchLoader(train_set, cfg.batch_size, shuffle=True,
                               num_workers=cfg.num_workers, drop_last=True, seed=seed)
    valid_loader = BatchLoader(valid_set, cfg.batch_size, shuffle=False,
                               num_workers=cfg.num_workers, drop_last=False, seed=seed)
    return train_loader, valid_loader
