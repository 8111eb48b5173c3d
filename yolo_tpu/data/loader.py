"""Host-side batch loading with background prefetch.

Replaces the reference's torch DataLoader (train.py:164-171): collates
variable-count annotations as a list of per-image [N, 5] arrays next to a
stacked image batch, shuffles per epoch, and overlaps host-side decode/
augmentation with device compute.

Worker modes (``workers=``):

- ``"auto"`` (default): ``"thread"`` when the dataset transform's pixel
  path runs native (SSDAugmentation's fused C++ backend — ctypes
  releases the GIL, so threads parallelize with zero worker IPC),
  ``"process"`` otherwise.
- ``"process"`` (like the reference's num_workers DataLoader
  processes): a forked pool runs ``dataset[i]`` with real parallelism —
  a pure-numpy SSD augmentation is GIL-bound and gains nothing from
  threads (measured table in docs/TRAINING.md). Each item's transform
  rng is re-seeded deterministically from (loader seed, epoch, index),
  so batches are reproducible regardless of worker count or scheduling
  — and the shared-Generator data race of the thread mode can't occur.
- ``"thread"``: a thread pool (also the fallback where fork is
  unavailable). cv2/native work overlaps; numpy-heavy transforms
  serialize on the GIL, and items draw from the transform's shared rng
  in arrival order (not reproducible across runs).
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import numpy as np


def detection_collate(samples) -> Tuple[np.ndarray, List[np.ndarray]]:
    """[(image HWC, target [N,5])...] -> (images [B,H,W,C], [targets])
    (reference data/__init__.py:9-27). uint8 images stay uint8 (the
    in-graph-normalize path, detector.normalize_u8); anything else is
    collated as float32."""
    imgs = np.stack([s[0] for s in samples])
    if imgs.dtype != np.uint8:
        imgs = imgs.astype(np.float32)
    targets = [np.asarray(s[1], np.float32) for s in samples]
    return imgs, targets


# Set (in the parent) immediately before the fork so pool workers inherit
# the dataset by COW page sharing — nothing is pickled per item but the
# indices and the returned samples.
_FORK_DATASET = None


def _fork_get(args):
    idx, seed = args
    ds = _FORK_DATASET
    tr = getattr(ds, "transform", None)
    if tr is not None and hasattr(tr, "rng"):
        # per-item deterministic augmentation stream (this worker's copy)
        tr.rng = np.random.default_rng(seed)
    return ds[int(idx)]


class BatchLoader:
    """Iterable over (images, targets) batches with prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 4, seed: int = 0,
                 process_id: int = 0, process_count: int = 1,
                 workers: str = "auto"):
        """``batch_size`` is the GLOBAL batch. With process_count > 1
        (multi-host DCN data parallelism) each process loads only its
        contiguous batch_size/process_count row-slice of every batch;
        the shared shuffle seed keeps all hosts' global orders aligned
        (assemble with parallel.distributed.host_local_to_global)."""
        if batch_size % process_count:
            raise ValueError(f"batch {batch_size} not divisible by "
                             f"{process_count} processes")
        if workers not in ("auto", "process", "thread"):
            raise ValueError(f"workers must be 'auto', 'process' or "
                             f"'thread', got {workers!r}")
        if workers == "auto":
            # threads win when the transform's pixel work runs native
            # (ctypes releases the GIL — no fork, no worker IPC);
            # processes win for GIL-bound numpy transforms (measured
            # table in docs/TRAINING.md).
            native_ok = getattr(getattr(dataset, "transform", None),
                                "_native_ok", None)
            try:
                workers = "thread" if native_ok and native_ok() \
                    else "process"
            except Exception:
                workers = "process"
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.process_id = process_id
        self.process_count = process_count
        if workers == "process" and "fork" not in \
                mp.get_all_start_methods():  # pragma: no cover - non-linux
            workers = "thread"
        self.workers = workers
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Align the loader's epoch counter after a resume: the shuffle
        order and per-item augmentation seeds are pure functions of
        (seed, epoch), so a restarted run that calls
        ``set_epoch(start_epoch)`` replays the exact batches an
        uninterrupted run would have seen (checkpoint/resume exactness
        — tests/test_train.py)."""
        self._epoch = int(epoch)

    def _batches_of_indices(self, epoch: int):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # derived per (seed, epoch), NOT a mutated sequential stream:
            # epoch N's order is identical whether or not epochs 0..N-1
            # ran in this process — required for exact resume
            np.random.default_rng((self.seed, epoch)).shuffle(idx)
        stop = (len(idx) // self.batch_size * self.batch_size
                if self.drop_last else len(idx))
        per = self.batch_size // self.process_count
        lo = self.process_id * per
        for i in range(0, stop, self.batch_size):
            batch = idx[i:i + self.batch_size]
            yield batch[lo:lo + per] if self.process_count > 1 else batch

    def __iter__(self) -> Iterator[Tuple[np.ndarray, List[np.ndarray]]]:
        epoch = self._epoch
        self._epoch += 1
        if self.workers == "process":
            global _FORK_DATASET
            _FORK_DATASET = self.dataset
            pool = mp.get_context("fork").Pool(self.num_workers)

            def fetch(batch_idx):
                return pool.map(_fork_get, [
                    (int(i), (self.seed, epoch, int(i)))
                    for i in batch_idx])

            def close():
                pool.terminate()
                pool.join()
        else:
            tpool = ThreadPoolExecutor(max_workers=self.num_workers)

            def get(args):
                idx, seed = args
                tr = getattr(self.dataset, "transform", None)
                if tr is not None and hasattr(tr, "rng"):
                    # SSDAugmentation.rng is thread-local: this lands in
                    # THIS worker thread's slot (race-free, per-item
                    # deterministic — same scheme as the process mode)
                    tr.rng = np.random.default_rng(seed)
                return self.dataset[int(idx)]

            def fetch(batch_idx):
                return list(tpool.map(get, [
                    (int(i), (self.seed, epoch, int(i)))
                    for i in batch_idx]))

            def close():
                tpool.shutdown(wait=False)

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        fail = object()

        def produce():
            try:
                for batch_idx in self._batches_of_indices(epoch):
                    q.put(detection_collate(fetch(batch_idx)))
                q.put(stop)
            except BaseException as e:  # re-raised in the consumer
                q.put((fail, e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] is fail:
                    raise item[1]
                yield item
        finally:
            close()


def prefetch_iter(iterable: Iterable, prepare: Optional[Callable] = None,
                  depth: int = 2) -> Iterator:
    """Run ``prepare`` over ``iterable`` in a producer thread ``depth``
    items ahead of the consumer.

    The training-loop use: ``prepare`` does the per-iteration host work
    (GT assignment, multi-scale resize, jax.device_put/sharding), so the
    host CPU and the host->device transfer of batch n+1 overlap the
    device computing batch n — jax dispatch is thread-safe and
    device_put is asynchronous, making this the TPU-side analogue of the
    reference's DataLoader worker prefetch. Items are prepared strictly
    in order (``prepare`` may carry sequential state, e.g. the
    multi-scale bucket schedule). Exceptions in ``prepare`` re-raise in
    the consumer. If the consumer abandons the iterator early the
    producer (a daemon thread) may stay blocked on the queue until
    process exit — fine for training loops, don't use for short-lived
    scans."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    stop = object()
    fail = object()

    def produce():
        try:
            for item in iterable:
                q.put(prepare(item) if prepare is not None else item)
            q.put(stop)
        except BaseException as e:  # pragma: no cover - surfaced below
            q.put((fail, e))

    threading.Thread(target=produce, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is fail:
            raise item[1]
        yield item
