"""Inference drivers: single utterance and padded-bucket folder sweep.

Replaces the reference's one-file-at-a-time multi-GPU process pool
(infer_single.py, infer_folder.py:156-232) with a TPU-friendly driver:

* utterances are grouped into **length buckets** (frame count rounded up to
  a bucket multiple) so each distinct jit shape compiles once;
* each bucket batch runs the full audio->audio enhancement as one fused
  device program (STFT + N-step sampler + iSTFT);
* per-utterance normalisation / renormalisation and the reference's
  clipping guard (scale by `clip_scale` when |x|>1; infer_single.py:98-99
  uses 0.5, infer_folder.py:120-121 uses 0.95) happen on host;
* multi-chip scale-out is per-process file sharding (shard_files), exactly
  the reference's strategy, no inter-chip communication needed.

Padding note: audio is reflect-padded to the bucket length and trimmed
after enhancement.  The reference runs TF-GridNet at exact length (and
zero-pads NCSN++ to x64 frames, util/other.py:76-90); bucketing introduces
negligible tail-local deviation and is the >=10x batching lever on TPU.
Set bucket_frames_multiple=1 for exact-shape parity.
"""

from __future__ import annotations

import dataclasses
import os
import time
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fdbm_tpu.model import FDBM
from fdbm_tpu.utils.audio import read_wav, resample, write_wav


def shard_files(files: Sequence[str], process_index: int, process_count: int) -> List[str]:
    """Static split of a file list across processes (infer_folder.py:150-153)."""
    return list(files[process_index::process_count])


@dataclasses.dataclass
class EnhanceStats:
    files: int = 0
    audio_seconds: float = 0.0
    wall_seconds: float = 0.0
    # Bucket-shape compile/prewarm time, included in wall_seconds.  A
    # warm persistent cache makes this small; steady_throughput excludes
    # it so sweeps can report cold and steady-state numbers separately.
    prewarm_seconds: float = 0.0
    failures: int = 0
    # Phase accounting (all included in wall_seconds): input decode,
    # the enhance dispatch loop, and the final output-write drain.
    read_seconds: float = 0.0
    enhance_seconds: float = 0.0
    write_drain_seconds: float = 0.0

    @property
    def throughput(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def steady_throughput(self) -> float:
        wall = self.wall_seconds - self.prewarm_seconds
        return self.audio_seconds / wall if wall > 0 else 0.0


class BucketedEnhancer:
    """Batched, bucketed audio->audio enhancement with jit-shape caching."""

    def __init__(
        self,
        fdbm: FDBM,
        params,
        sampler_type: Optional[str] = None,
        N: Optional[int] = None,
        batch_size: int = 8,
        bucket_frames_multiple: int = 64,
        sampler_kwargs: Optional[dict] = None,
        mesh=None,
        chunk_seconds: Optional[float] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis —
        each bucket batch is then sharded across the mesh's chips
        (parallel/mesh.py:make_parallel_enhance), so a single-controller
        multi-chip host splits every batch over ICI instead of running it
        on one chip.  batch_size must divide the mesh size.

        ``chunk_seconds``: sweet-spot pooled chunk serving — utterances
        longer than ~this are split into equal exact-length chunks
        pooled through the same batched sweep and cross-fade reassembled
        (see _enhance_pooled).  None = whole-utterance serving (exact
        reference semantics up to bucketing)."""
        self.fdbm = fdbm
        self.params = params
        self.sampler_type = sampler_type
        self.N = N
        self.batch_size = batch_size
        self.bucket_multiple = max(1, bucket_frames_multiple)
        self.sampler_kwargs = sampler_kwargs or {}
        self.mesh = mesh
        self.chunk_seconds = chunk_seconds
        if mesh is not None and batch_size % mesh.devices.size != 0:
            raise ValueError(
                f"batch_size {batch_size} must divide by mesh size "
                f"{mesh.devices.size} for batch-sharded serving")
        self._jitted: Dict[int, object] = {}

    # -- internals -----------------------------------------------------------

    # Pooled-serving fine bucket quantum (frames).  Chunk lengths are
    # planned directly ON this grid (_chunk_plan), so chunked rows run at
    # their exact compute shape with ZERO bucket padding; the quantum also
    # applies to whole short files inside the sweet band (>= 2/3 target),
    # where the compile set stays bounded (~(3/2-2/3)*target/16 shapes).
    _FINE_FRAMES = 16

    def _bucket_length(self, n_samples: int) -> int:
        """Smallest multiple of (bucket_multiple * hop) >= n_samples, so a
        bucket always covers the utterance and frame counts per bucket are
        multiples of bucket_multiple (+1).

        Pooled chunk serving (chunk_seconds set) buckets rows in the
        sweet band at the fine 16-frame quantum instead: the r5 mixed
        sweep measured ~11% of every chunked row lost to re-snapping the
        fine-planned chunks up to the 64-frame grid (277-frame chunks
        computed at 320)."""
        hop = self.fdbm.cfg.hop_length
        quantum = self.bucket_multiple * hop
        if self.chunk_seconds:
            target = int(self.chunk_seconds * self.fdbm.cfg.sr)
            if n_samples * 3 >= target * 2:  # sweet band: >= 2/3 target
                quantum = min(quantum, self._FINE_FRAMES * hop)
        return max(quantum, -(-n_samples // quantum) * quantum)

    def _get_fn(self, length: int):
        fn = self._jitted.get(length)
        if fn is None:
            # NCSN++ CLIs use reflection frame padding
            # (reference infer_single.py:64-69, infer_folder.py:83-88).
            pad_mode = ("reflection"
                        if self.fdbm.cfg.backbone.startswith("ncsnpp")
                        else "zero_pad")

            if self.mesh is not None:
                from fdbm_tpu.parallel.mesh import make_parallel_enhance

                fn = make_parallel_enhance(
                    self.fdbm, self.mesh, sampler_type=self.sampler_type,
                    N=self.N, pad_mode=pad_mode, **self.sampler_kwargs)
            else:
                def enhance(params, y_audio, key):
                    return self.fdbm.enhance_batch(
                        params, y_audio, key, sampler_type=self.sampler_type,
                        N=self.N, pad_mode=pad_mode, **self.sampler_kwargs,
                    )

                fn = jax.jit(enhance)
            self._jitted[length] = fn
        return fn

    def _dispatch_width(self, n_rows: int) -> int:
        """Batch width a group of n_rows rows dispatches at: the full
        batch size, except the under-filled remainder group, which runs
        at the covering power of two (mesh serving always full-width)."""
        if self.mesh is not None or n_rows >= self.batch_size:
            return self.batch_size
        return max(1, 1 << (n_rows - 1).bit_length())

    def plan(self, lengths: Sequence[int]) -> List[Tuple[int, List[int]]]:
        """Sorted-packing schedule: files in DESCENDING length order, packed
        into consecutive groups of ``batch_size``; each group's bucket is
        its longest member's snapped length.

        Against per-bucket packing this keeps every batch full (the only
        partial batch is the global remainder, deliberately placed on the
        SHORTEST files where zero rows are cheapest) while the in-group
        padding stays small because sorted neighbours have similar
        lengths — the round-4 120-file sweep measured per-bucket packing
        at 69% dispatched-row utilisation (10 batches, 4 of them
        fractionally filled) vs 85% for this plan with the SAME four
        compiled bucket shapes. Grouping is order-stable, so any caller
        that chunks a descending-sorted file list at multiples of
        batch_size (enhance_folder does) gets chunk-local plans whose
        groups coincide with the global plan — prewarm can therefore
        compile exactly the shapes the sweep will use."""
        order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
        sched: List[Tuple[int, List[int]]] = []
        for s in range(0, len(order), self.batch_size):
            grp = order[s : s + self.batch_size]
            sched.append((self._bucket_length(lengths[grp[0]]), grp))
        return sched

    def prewarm(self, lengths: Sequence[int],
                batch_sizes: Optional[Sequence[int]] = None) -> float:
        """Compile all (bucket length, batch) shapes CONCURRENTLY.

        XLA compiles each program on its own thread pool but `jax.jit`
        dispatch is lazy per shape — a folder sweep otherwise pays each
        bucket's compile serially as it reaches it (minutes each for
        unrolled N=30 samplers on this toolchain). AOT-lowering every
        expected shape from a thread pool overlaps the compiles.

        Returns wall seconds spent. Threads only trigger compilation; the
        cached executables are reused by enhance_many via jax.jit's
        C++ fast-path cache.
        """
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        t0 = _time.perf_counter()
        sizes = list(batch_sizes or [self.batch_size])
        key = jax.random.PRNGKey(0)
        if self.chunk_seconds:
            # pooled chunk serving dispatches the chunk pieces, not the
            # raw files — compile the piece shapes.
            pieces: List[int] = []
            for L in lengths:
                chunk_len, starts = self._chunk_plan(int(L))
                pieces.extend([chunk_len] * len(starts))
            lengths = pieces

        def compile_one(args):
            blen, bs = args
            fn = self._get_fn(blen)
            dummy = jnp.zeros((bs, blen), jnp.float32)
            # trigger trace+compile; result discarded
            fn(self.params, dummy, key).block_until_ready()

        plans = self.plan(list(lengths))
        # the widths enhance_many will actually dispatch (incl. the
        # power-of-two remainder), plus any explicitly requested sizes
        jobs = {(blen, self._dispatch_width(len(grp))) for blen, grp in plans}
        if batch_sizes:
            jobs |= {(blen, bs) for blen, _ in plans for bs in sizes}
        jobs = sorted(jobs)
        with ThreadPoolExecutor(max_workers=min(8, len(jobs) or 1)) as pool:
            list(pool.map(compile_one, jobs))
        return _time.perf_counter() - t0

    @staticmethod
    def _normalise(y: np.ndarray, mode: str) -> Tuple[np.ndarray, float]:
        if mode == "noisy":
            norm = float(np.max(np.abs(y)))
        elif mode == "std":
            norm = float(np.std(y))
        else:
            norm = 1.0
        norm = norm if norm != 0 else 1.0
        return (y / norm).astype(np.float32), norm

    # -- public --------------------------------------------------------------

    def enhance_many(self, audios: Sequence[np.ndarray], key: jax.Array,
                     clip_scale: float = 0.95,
                     max_seconds: float = 30.0,
                     _pooled: bool = True) -> List[np.ndarray]:
        """Enhance a list of 1-D float32 utterances; preserves order.

        With ``chunk_seconds`` set on the enhancer, all utterances go
        through sweet-spot pooled chunk serving (_enhance_pooled).
        Otherwise utterances longer than ``max_seconds`` are processed as
        per-file overlapping chunks with a cross-fade (the scalable
        long-utterance strategy — SURVEY.md section 5; the reference
        pushes arbitrary lengths through in one shot, which OOMs/slows
        beyond ~10^6 samples)."""
        if self.chunk_seconds and _pooled:
            return self._enhance_pooled(audios, key, clip_scale)
        cfg = self.fdbm.cfg
        max_len = (int(max_seconds * cfg.sr) if np.isfinite(max_seconds)
                   else max(len(a) for a in audios) + 1)
        long_idx = [i for i, a in enumerate(audios) if len(a) > max_len]
        if long_idx:
            out_all: List[Optional[np.ndarray]] = [None] * len(audios)
            short = [i for i in range(len(audios)) if i not in set(long_idx)]
            if short:
                key, sub = jax.random.split(key)
                shorts = self.enhance_many([audios[i] for i in short], sub,
                                           clip_scale, max_seconds=np.inf)
                for j, i in enumerate(short):
                    out_all[i] = shorts[j]
            for i in long_idx:
                key, sub = jax.random.split(key)
                out_all[i] = self._enhance_long(audios[i], sub, clip_scale,
                                                max_len)
            return out_all  # type: ignore[return-value]

        # Sorted-packing schedule (see plan): full batches, descending
        # lengths, one compiled program per distinct snapped group-max.
        # Full groups run at the full batch shape (zero rows, outputs
        # discarded) — compiles cost minutes on this toolchain, wasted
        # rows cost milliseconds; only the global remainder shrinks to
        # its power-of-two width (_dispatch_width).
        schedule = self.plan([len(a) for a in audios])

        out: List[Optional[np.ndarray]] = [None] * len(audios)

        def dispatch(blen: int, chunk: List[int], sub: jax.Array):
            """Host-side batch build + ASYNC device dispatch.

            The global-remainder batch (sorted-packing puts it on the
            SHORTEST rows) dispatches at the power-of-two width covering
            its real rows instead of the full batch width — the r5 sweep
            measured the full-width remainder (4 real rows of 16) at a
            whole batch's cost, ~6% of the steady window.  jax.jit
            re-specialises per shape, so this is one extra compile per
            (bucket, width), prewarmed like the rest.  Mesh serving keeps
            the full width (batch must divide the mesh)."""
            width = self._dispatch_width(len(chunk))
            batch = np.zeros((width, blen), np.float32)
            norms = np.ones(width, np.float32)
            for j, i in enumerate(chunk):
                a, norm = self._normalise(audios[i], cfg.normalize)
                norms[j] = norm
                L = len(a)
                if L >= blen:
                    batch[j] = a[:blen]
                else:
                    # reflect-pad keeps tail statistics natural
                    reps = np.concatenate([a, a[::-1]])
                    tiled = np.tile(reps, -(-blen // len(reps)))[:blen]
                    batch[j] = tiled
            fn = self._get_fn(blen)
            return fn(self.params, jnp.asarray(batch), sub), norms, chunk

        def retire(pending) -> None:
            """Block on a dispatched batch and post-process on host."""
            fut, norms, chunk = pending
            enhanced = np.asarray(fut)  # device sync happens here
            for j, i in enumerate(chunk):
                L = len(audios[i])
                x = enhanced[j, :L] * norms[j]
                peak = np.max(np.abs(x))
                if peak > 1.0:
                    # renormalise to clip_scale peak (reference
                    # infer_single.py:98-99 uses 0.5, infer_folder 0.95)
                    x = x / peak * clip_scale
                out[i] = x.astype(np.float32)

        # Software pipeline over jax's async dispatch: up to ``depth``
        # batches are built on host and queued on the device BEFORE
        # blocking on the oldest result, so host prep/post-processing AND
        # h2d transfer overlap device compute (the reference builds each
        # batch synchronously between dispatches — that serial host work
        # was ~1/3 of the end-to-end folder-sweep gap vs the steady-state
        # bench, BENCH_NOTES r2; depth 3 additionally hides the per-batch
        # h2d/dispatch latency the depth-1 pipeline still exposed at the
        # retire boundary).  Memory bound: depth x batch output buffers
        # (~5 MB each at production shapes) — trivial.
        depth = int(os.environ.get("FDBM_TPU_SERVE_DEPTH", "3"))
        trace = os.environ.get("FDBM_TPU_SERVE_TRACE") == "1"
        from collections import deque

        t_prev = time.perf_counter()
        pending: deque = deque()
        for blen, chunk in schedule:
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            pending.append(dispatch(blen, chunk, sub))
            t1 = time.perf_counter()
            t2 = t1
            if len(pending) >= max(1, depth):
                retire(pending.popleft())
                t2 = time.perf_counter()
            if trace:
                print(f"[serve] blen={blen} n={len(chunk)} "
                      f"gap={t0 - t_prev:.2f} build+h2d={t1 - t0:.2f} "
                      f"retire={t2 - t1:.2f}", flush=True)
            t_prev = t2
        while pending:
            retire(pending.popleft())
        return out  # type: ignore[return-value]

    @staticmethod
    def _overlap_add(total_len: int, segments: List[Tuple[int, np.ndarray]],
                     ramp_len: int) -> np.ndarray:
        """Cross-fade reassembly of ``(start, enhanced_chunk)`` segments.

        Linear ramps of ``ramp_len`` samples at interior chunk edges;
        where overlaps are wider than the ramp the weights normalise to
        an average of the contributing chunks."""
        out = np.zeros(total_len, np.float64)
        weight = np.zeros(total_len, np.float64)
        for s, e in segments:
            n = len(e)
            w = np.ones(n)
            ramp = min(ramp_len, n)
            w[:ramp] = np.linspace(0, 1, ramp, endpoint=False) if s > 0 else 1.0
            w[n - ramp :] = np.minimum(w[n - ramp :],
                                       np.linspace(1, 0, ramp, endpoint=False)) \
                if s + n < total_len else w[n - ramp :]
            out[s : s + n] += e * w
            weight[s : s + n] += w
        return (out / np.maximum(weight, 1e-8)).astype(np.float32)

    def _enhance_long(self, audio: np.ndarray, key: jax.Array,
                      clip_scale: float, max_len: int) -> np.ndarray:
        """Chunked overlap-add enhancement with a linear cross-fade."""
        hop = self.fdbm.cfg.hop_length
        overlap = 16 * hop  # 16 frames of cross-fade
        chunk_len = max_len - (max_len % hop)
        step = chunk_len - overlap
        starts = list(range(0, max(1, len(audio) - overlap), step))
        chunks = [audio[s : s + chunk_len] for s in starts]
        key, sub = jax.random.split(key)
        enhanced = self.enhance_many(chunks, sub, clip_scale, max_seconds=np.inf)
        return self._overlap_add(len(audio),
                                 list(zip(starts, enhanced)), overlap)

    def _chunk_plan(self, n_samples: int) -> Tuple[int, List[int]]:
        """(chunk_len, starts) for sweet-spot pooled chunking.

        Chunk lengths are planned directly ON the serving bucket grid
        (the fine 16-frame quantum _bucket_length uses inside the sweet
        band), so a chunked row's compute shape IS its chunk length —
        zero bucket padding.  k (the chunk count) is chosen to MINIMISE
        the computed frames k * chunk_len subject to chunks staying in
        the sweet band (2/3..3/2 x target — below, per-row fixed costs
        bite; above, the O(T^2) attention / V-ladder superlinear regime
        the r4 sweep measured at +33% per frame), tie-broken toward
        fewer chunks.  Files at most 3/2 x target pass through whole
        (k=1, normal bucketing).  Evenly-spaced starts keep overlaps
        >= 16 frames of cross-fade (guaranteed by the coverage
        constraint chunk_len >= (L + (k-1)*overlap) / k)."""
        cfg = self.fdbm.cfg
        target = int(self.chunk_seconds * cfg.sr)
        overlap = 16 * cfg.hop_length
        fine = self._FINE_FRAMES * cfg.hop_length
        lo = (2 * target) // 3
        hi = (3 * target + 1) // 2
        if n_samples <= max(hi, fine):
            return n_samples, [0]
        best: Optional[Tuple[int, int, int]] = None  # (cost, k, chunk_len)
        k_min = max(2, -(-n_samples // hi))
        k_max = max(k_min, n_samples // max(lo, fine))
        for k in range(k_min, k_max + 1):
            chunk_len = -(-(n_samples + (k - 1) * overlap) // k)
            chunk_len = -(-chunk_len // fine) * fine
            if chunk_len > n_samples:
                continue
            if best is not None and chunk_len < lo:
                break  # below the band and a feasible plan exists
            cost = k * chunk_len
            if best is None or cost < best[0]:
                best = (cost, k, chunk_len)
        if best is None:  # pathological (tiny target): fall back to k_min
            k = k_min
            chunk_len = min(n_samples,
                            -(-(-(-(n_samples + (k - 1) * overlap) // k))
                              // fine) * fine)
            best = (k * chunk_len, k, chunk_len)
        _, k, chunk_len = best
        starts = [round(j * (n_samples - chunk_len) / (k - 1))
                  for j in range(k)]
        return chunk_len, starts

    def _enhance_pooled(self, audios: Sequence[np.ndarray], key: jax.Array,
                        clip_scale: float) -> List[np.ndarray]:
        """Sweet-spot pooled chunk serving (the production folder path).

        Every utterance longer than ~chunk_seconds is split by
        _chunk_plan into equal exact-length chunks; ALL chunks from ALL
        files go through ONE sorted-packing batched sweep (so every
        dispatched row sits near the per-row efficiency sweet spot —
        the 4-5 s shapes the r4 profile measured at ~15 audio-s/s —
        instead of the superlinear O(T^2)-attention long buckets), then
        each file is reassembled with a 16-frame cross-fade.  Short
        files pass through untouched (single chunk == the whole file,
        normal bucketing).  The sweet spot defaults to the training
        crop length (256 frames = 4.096 s), so chunks match the
        receptive field the DNN was trained on."""
        hop = self.fdbm.cfg.hop_length
        overlap = 16 * hop
        pieces: List[np.ndarray] = []
        meta: List[Tuple[int, int]] = []  # (file idx, start)
        for i, a in enumerate(audios):
            chunk_len, starts = self._chunk_plan(len(a))
            for s in starts:
                pieces.append(a[s : s + chunk_len])
                meta.append((i, s))
        key, sub = jax.random.split(key)
        enhanced = self.enhance_many(pieces, sub, clip_scale,
                                     max_seconds=np.inf, _pooled=False)
        per_file: List[List[Tuple[int, np.ndarray]]] = [[] for _ in audios]
        for (i, s), e in zip(meta, enhanced):
            per_file[i].append((s, e))
        out: List[np.ndarray] = []
        for i, a in enumerate(audios):
            segs = per_file[i]
            if len(segs) == 1:
                out.append(segs[0][1])
            else:
                out.append(self._overlap_add(len(a), segs, overlap))
        return out


def enhance_folder(
    fdbm: FDBM,
    params,
    test_dir: str,
    enhanced_dir: str,
    sampler_type: Optional[str] = None,
    N: Optional[int] = None,
    batch_size: int = 8,
    keep_structure: bool = True,
    target_sr: int = 16000,
    seed: int = 0,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    bucket_frames_multiple: int = 64,
    sampler_kwargs: Optional[dict] = None,
    progress: bool = True,
    mesh=None,
    chunk_seconds: Optional[float] = 4.096,
) -> EnhanceStats:
    """Enhance every wav under test_dir into enhanced_dir.

    ``mesh``: optional data mesh for single-controller multi-chip serving —
    every bucket batch is sharded over the mesh's chips (batch_size must
    divide the mesh size); per-process file sharding composes on top for
    multi-host pods.

    ``chunk_seconds``: sweet-spot pooled chunk serving (default ON at the
    training crop length, 256 frames = 4.096 s): long utterances are
    split into equal near-sweet-spot chunks pooled through the batched
    sweep and cross-fade reassembled, so every dispatched row runs at
    the per-row efficiency peak instead of the superlinear long-bucket
    shapes, and the compile set stays bounded for ANY folder.  Pass
    None/0 for whole-utterance serving (reference semantics up to
    bucketing; the reference itself is whole-utterance,
    infer_folder.py:156-232)."""
    files = sorted(
        glob(os.path.join(test_dir, "**", "*.wav"), recursive=True)
        + glob(os.path.join(test_dir, "**", "*.flac"), recursive=True)
    )
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    files = shard_files(files, pi, pc)

    enhancer = BucketedEnhancer(
        fdbm, params, sampler_type=sampler_type, N=N, batch_size=batch_size,
        bucket_frames_multiple=bucket_frames_multiple,
        sampler_kwargs=sampler_kwargs, mesh=mesh,
        chunk_seconds=chunk_seconds or None,
    )
    key = jax.random.PRNGKey(seed + pi)
    stats = EnhanceStats()
    t_start = time.perf_counter()

    # Read everything we can; per-file fault tolerance like
    # infer_folder.py:142-147 (skip + count failures, keep going).
    t_read = time.perf_counter()
    todo: List[Tuple[str, np.ndarray]] = []
    for path in files:
        try:
            audio, sr = read_wav(path)
            audio = audio[0]
            if sr != target_sr:
                audio = resample(audio, sr, target_sr)
            todo.append((path, audio))
        except Exception as e:
            print(f"[skip] {path}: {e}")
            stats.failures += 1

    # Compile every bucket shape concurrently before the sweep — unrolled
    # N=30 samplers take minutes each to compile serially on this
    # toolchain (BENCH_NOTES.md).
    stats.read_seconds = time.perf_counter() - t_read
    if todo:
        secs = enhancer.prewarm([len(a) for _, a in todo],
                                batch_sizes=[batch_size])
        stats.prewarm_seconds = secs
        if progress:
            print(f"prewarmed {len(enhancer._jitted)} bucket shapes "
                  f"in {secs:.0f}s", flush=True)

    # Sort by length for dense bucketing, enhance in chunks.  Output wav
    # writes run on a worker thread so host file I/O overlaps the next
    # chunk's device compute (serial wav writes were part of the gap
    # between the folder sweep and the steady-state bench, BENCH_NOTES r2).
    from concurrent.futures import ThreadPoolExecutor

    # DESCENDING, so each chunk's sorted-packing plan (enhance_many)
    # reproduces a slice of the global plan prewarm compiled for —
    # chunk boundaries are multiples of batch_size.
    order = sorted(range(len(todo)), key=lambda i: -len(todo[i][1]))
    chunk_size = batch_size * 16
    done = 0

    def _write_one(out_path: str, x_hat: np.ndarray) -> float:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        write_wav(out_path, x_hat, target_sr)
        return len(x_hat) / target_sr

    write_futs = []
    t_enh = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as writer:
        for s in range(0, len(order), chunk_size):
            idxs = order[s : s + chunk_size]
            audios = [todo[i][1] for i in idxs]
            key, sub = jax.random.split(key)
            try:
                enhanced = enhancer.enhance_many(audios, sub)
            except Exception as e:
                print(f"[skip chunk] {e}")
                stats.failures += len(idxs)
                continue
            for i, x_hat in zip(idxs, enhanced):
                path = todo[i][0]
                rel = (os.path.relpath(path, test_dir) if keep_structure
                       else os.path.basename(path))
                out_path = os.path.join(enhanced_dir,
                                        os.path.splitext(rel)[0] + ".wav")
                if np.isnan(x_hat).any():
                    print(f"[skip] {path}: NaN output")
                    stats.failures += 1
                    continue
                write_futs.append(
                    (path, writer.submit(_write_one, out_path, x_hat)))
            done += len(idxs)
            if progress:
                print(f"enhanced {done}/{len(order)} files", flush=True)
        stats.enhance_seconds = time.perf_counter() - t_enh
        t_drain = time.perf_counter()
        for path, fut in write_futs:
            try:
                stats.audio_seconds += fut.result()
                stats.files += 1
            except Exception as e:
                print(f"[skip] {path}: write failed: {e}")
                stats.failures += 1
        stats.write_drain_seconds = time.perf_counter() - t_drain

    stats.wall_seconds = time.perf_counter() - t_start
    return stats


def enhance_single(
    fdbm: FDBM,
    params,
    noisy_file: str,
    output_file: str,
    sampler_type: Optional[str] = None,
    N: Optional[int] = None,
    target_sr: int = 16000,
    seed: int = 0,
    sampler_kwargs: Optional[dict] = None,
    exact_shape: bool = False,
) -> np.ndarray:
    """Single-file enhancement (reference infer_single.py:53-107).

    By default the utterance is snapped to a 64-frame bucket (pad ->
    enhance -> trim), so any length reuses one of a handful of compiled
    programs — a fresh length costs seconds warm instead of a fresh
    10-15 min unrolled-N=30 compile per distinct shape on this toolchain
    (BENCH_NOTES r4/r5).  ``exact_shape=True`` restores the
    exact-length program (bit-matching the bucketless reference path)
    at that compile cost."""
    audio, sr = read_wav(noisy_file)
    audio = audio[0]
    if sr != target_sr:
        audio = resample(audio, sr, target_sr)
    enhancer = BucketedEnhancer(
        fdbm, params, sampler_type=sampler_type, N=N, batch_size=1,
        bucket_frames_multiple=1 if exact_shape else 64,
        sampler_kwargs=sampler_kwargs,
    )
    x_hat = enhancer.enhance_many([audio], jax.random.PRNGKey(seed),
                                  clip_scale=0.5)[0]
    os.makedirs(os.path.dirname(os.path.abspath(output_file)), exist_ok=True)
    write_wav(output_file, x_hat, target_sr)
    return x_hat
