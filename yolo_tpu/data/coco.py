"""COCO detection dataset.

Mirrors the reference COCODataset surface (data/cocodataset.py:33-167):
pull_item returns (image, normalized [N,5] target, h, w); class ids are
mapped through the 80-class contiguous index; a ``debug`` flag truncates
to one sample.

Uses pycocotools when installed; otherwise the pure-numpy shim
(yolo_tpu.data.coco_api) provides the same annotation-index API, so the
COCO path runs in environments without pycocotools.
"""

from __future__ import annotations

import os.path as osp
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

try:
    from pycocotools.coco import COCO
    HAS_PYCOCOTOOLS = True
except ImportError:  # pure-numpy fallback (this image lacks pycocotools)
    from yolo_tpu.data.coco_api import COCO
    HAS_PYCOCOTOOLS = False

coco_class_labels = (
    'background', 'person', 'bicycle', 'car', 'motorcycle', 'airplane',
    'bus', 'train', 'truck', 'boat', 'traffic light', 'fire hydrant',
    'street sign', 'stop sign', 'parking meter', 'bench', 'bird', 'cat',
    'dog', 'horse', 'sheep', 'cow', 'elephant', 'bear', 'zebra', 'giraffe',
    'hat', 'backpack', 'umbrella', 'shoe', 'eye glasses', 'handbag', 'tie',
    'suitcase', 'frisbee', 'skis', 'snowboard', 'sports ball', 'kite',
    'baseball bat', 'baseball glove', 'skateboard', 'surfboard',
    'tennis racket', 'bottle', 'plate', 'wine glass', 'cup', 'fork',
    'knife', 'spoon', 'bowl', 'banana', 'apple', 'sandwich', 'orange',
    'broccoli', 'carrot', 'hot dog', 'pizza', 'donut', 'cake', 'chair',
    'couch', 'potted plant', 'bed', 'mirror', 'dining table', 'window',
    'desk', 'toilet', 'door', 'tv', 'laptop', 'mouse', 'remote',
    'keyboard', 'cell phone', 'microwave', 'oven', 'toaster', 'sink',
    'refrigerator', 'blender', 'book', 'clock', 'vase', 'scissors',
    'teddy bear', 'hair drier', 'toothbrush')

coco_class_index = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90)


class COCODataset:
    def __init__(self, data_dir: str, json_file: str = "instances_train2017.json",
                 name: str = "train2017", img_size: int = 416,
                 transform=None, debug: bool = False):
        self.data_dir = data_dir
        self.json_file = json_file
        self.coco = COCO(osp.join(data_dir, "annotations", json_file))
        self.ids = self.coco.getImgIds()
        if debug:
            self.ids = self.ids[1:2]
        self.class_ids = sorted(self.coco.getCatIds())
        self.name = name
        self.img_size = img_size
        self.transform = transform

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, index):
        im, gt, _, _ = self.pull_item(index)
        return im, gt

    def pull_image(self, index):
        id_ = self.ids[index]
        img_file = osp.join(self.data_dir, self.name,
                            "{:012}".format(id_) + ".jpg")
        return cv2.imread(img_file), id_

    def pull_item(self, index):
        id_ = self.ids[index]
        anno_ids = self.coco.getAnnIds(imgIds=[int(id_)], iscrowd=None)
        annotations = self.coco.loadAnns(anno_ids)
        img, _ = self.pull_image(index)
        height, width, _ = img.shape

        target = []
        for anno in annotations:
            x, y, w, h = anno["bbox"]
            if anno["area"] > 0 and w > 1 and h > 1:
                label = self.class_ids.index(anno["category_id"])
                target.append([x / width, y / height, (x + w) / width,
                               (y + h) / height, label])
        target = np.asarray(target, np.float32).reshape(-1, 5)

        if self.transform is not None:
            img, boxes, labels = self.transform(
                img, target[:, :4], target[:, 4])
            target = np.hstack((boxes, labels[:, None]))
        return img, target, height, width
