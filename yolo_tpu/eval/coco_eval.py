"""COCO mAP evaluation.

Mirrors the reference COCOAPIEvaluator (utils/cocoapi_evaluator.py:53-126):
collects detections as COCO-json records, runs COCOeval bbox, returns
(AP50, AP50:95) — but feeds them from the batched in-graph detector.
Uses pycocotools' COCOeval when installed, else the pure-numpy
implementation in yolo_tpu.data.coco_api.
"""

from __future__ import annotations

import json
import tempfile
from typing import Callable

import numpy as np

try:
    from pycocotools.cocoeval import COCOeval
    HAS_PYCOCOTOOLS = True
except ImportError:  # pure-numpy fallback (this image lacks pycocotools)
    from yolo_tpu.data.coco_api import COCOeval
    HAS_PYCOCOTOOLS = False


class COCOEvaluator:
    def __init__(self, dataset, batch_size: int = 32):
        self.dataset = dataset
        self.batch_size = batch_size
        self.ap50_95 = self.ap50 = None

    def evaluate(self, detect_batch: Callable):
        from yolo_tpu.data.coco import coco_class_index

        ds = self.dataset
        n = len(ds)
        records = []
        img_ids = []
        for start in range(0, n, self.batch_size):
            idx = list(range(start, min(start + self.batch_size, n)))
            items = [ds.pull_item(i) for i in idx]
            images = np.stack([it[0] for it in items])
            boxes, scores, classes, valid = (
                np.asarray(a) for a in detect_batch(images))
            for bi, i in enumerate(idx):
                _, _, h, w = items[bi]
                coco_id = int(ds.ids[i])
                img_ids.append(coco_id)
                for k in np.where(valid[bi])[0]:
                    x1, y1, x2, y2 = boxes[bi, k] * [w, h, w, h]
                    label = coco_class_index[int(classes[bi, k])]
                    records.append({
                        "image_id": coco_id, "category_id": int(label),
                        "bbox": [float(x1), float(y1), float(x2 - x1),
                                 float(y2 - y1)],
                        "score": float(scores[bi, k]),
                    })
        if not records:
            self.ap50_95 = self.ap50 = 0.0
            return 0.0, 0.0
        with tempfile.NamedTemporaryFile("w", suffix=".json") as f:
            json.dump(records, f)
            f.flush()
            coco_dt = self.dataset.coco.loadRes(f.name)
            ev = COCOeval(self.dataset.coco, coco_dt, "bbox")
            ev.params.imgIds = img_ids
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
        self.ap50_95, self.ap50 = ev.stats[0], ev.stats[1]
        return self.ap50, self.ap50_95
