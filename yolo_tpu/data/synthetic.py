"""Synthetic detection dataset: colored rectangles on noise backgrounds.

The reference has no test data story (its "debug fixture" truncates COCO
to one image, data/cocodataset.py:54-56); this dataset gives the test
suite, benchmarks, and end-to-end training checks deterministic data with
known ground truth — no downloads.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class SyntheticDetection:
    """Images with 1..max_objects solid rectangles; class = color index."""

    def __init__(self, size: Tuple[int, int] = (240, 320),
                 num_classes: int = 2, length: int = 64,
                 max_objects: int = 3, transform=None, seed: int = 0):
        self.size = size
        self.num_classes = num_classes
        self.length = length
        self.max_objects = max_objects
        self.transform = transform
        self.seed = seed
        self.name = "synthetic"
        # distinct colors per class (BGR, uint8)
        rng = np.random.default_rng(1234)
        self.colors = rng.integers(64, 255, (num_classes, 3))

    def __len__(self):
        return self.length

    def _make(self, index):
        rng = np.random.default_rng(self.seed * 100003 + index)
        h, w = self.size
        img = (rng.random((h, w, 3)) * 40).astype(np.uint8)
        n = int(rng.integers(1, self.max_objects + 1))
        boxes, labels = [], []
        for _ in range(n):
            bw = rng.uniform(0.15, 0.5) * w
            bh = rng.uniform(0.15, 0.5) * h
            x1 = rng.uniform(0, w - bw)
            y1 = rng.uniform(0, h - bh)
            cls = int(rng.integers(0, self.num_classes))
            img[int(y1):int(y1 + bh), int(x1):int(x1 + bw)] = \
                self.colors[cls]
            boxes.append([x1 / w, y1 / h, (x1 + bw) / w, (y1 + bh) / h])
            labels.append(cls)
        return img, np.asarray(boxes, np.float32), np.asarray(labels)

    def __getitem__(self, index):
        im, gt, _, _ = self.pull_item(index)
        return im, gt

    def pull_item(self, index):
        img, boxes, labels = self._make(index)
        h, w = img.shape[:2]
        if self.transform is not None:
            img, boxes, labels = self.transform(img, boxes, labels)
        target = np.hstack((boxes, labels[:, None].astype(np.float32)))
        return img, target, h, w

    def pull_image(self, index):
        img, _, _ = self._make(index)
        return img, ("synthetic", str(index))

    def pull_anno(self, index):
        _, boxes, labels = self._make(index)
        return str(index), np.hstack(
            (boxes, labels[:, None].astype(np.float32))).tolist()
