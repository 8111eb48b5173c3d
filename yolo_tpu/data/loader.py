"""Host-side batch loading with background prefetch.

Replaces the reference's torch DataLoader (train.py:164-171): collates
variable-count annotations as a list of per-image [N, 5] arrays next to a
stacked image batch, shuffles per epoch, and overlaps host-side decode/
augmentation with device compute via a thread-pool prefetcher (the
dataset transforms release the GIL inside cv2).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np


def detection_collate(samples) -> Tuple[np.ndarray, List[np.ndarray]]:
    """[(image HWC, target [N,5])...] -> (images [B,H,W,C], [targets])
    (reference data/__init__.py:9-27)."""
    imgs = np.stack([s[0] for s in samples]).astype(np.float32)
    targets = [np.asarray(s[1], np.float32) for s in samples]
    return imgs, targets


class BatchLoader:
    """Iterable over (images, targets) batches with prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 4, seed: int = 0,
                 process_id: int = 0, process_count: int = 1):
        """``batch_size`` is the GLOBAL batch. With process_count > 1
        (multi-host DCN data parallelism) each process loads only its
        contiguous batch_size/process_count row-slice of every batch;
        the shared shuffle seed keeps all hosts' global orders aligned
        (assemble with parallel.distributed.host_local_to_global)."""
        if batch_size % process_count:
            raise ValueError(f"batch {batch_size} not divisible by "
                             f"{process_count} processes")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(seed)
        self.process_id = process_id
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches_of_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        stop = (len(idx) // self.batch_size * self.batch_size
                if self.drop_last else len(idx))
        per = self.batch_size // self.process_count
        lo = self.process_id * per
        for i in range(0, stop, self.batch_size):
            batch = idx[i:i + self.batch_size]
            yield batch[lo:lo + per] if self.process_count > 1 else batch

    def __iter__(self) -> Iterator[Tuple[np.ndarray, List[np.ndarray]]]:
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            try:
                for batch_idx in self._batches_of_indices():
                    samples = list(pool.map(self.dataset.__getitem__,
                                            batch_idx))
                    q.put(detection_collate(samples))
            finally:
                q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                yield item
        finally:
            pool.shutdown(wait=False)
