"""VOC-format detection datasets (VOC2007/2012 + the face-mask set).

One parametrized class replaces the reference's two near-identical
modules (data/voc0712.py and data/voc_mask.py): same XML annotation
parsing (1-based coords minus one, normalized by image size, difficult
filtering) and the same pull_item/pull_image/pull_anno surface.
"""

from __future__ import annotations

import os.path as osp
import xml.etree.ElementTree as ET
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")

VOC_CLASSES_MASK = ("face", "face_mask")


def parse_voc_annotation(root: ET.Element, width: float, height: float,
                         class_to_ind: dict,
                         keep_difficult: bool = False) -> List[List[float]]:
    """XML -> [[xmin, ymin, xmax, ymax, label], ...], coords normalized
    (reference data/voc_mask.py:47-77: 1-based ints minus one, /size)."""
    res = []
    for obj in root.iter("object"):
        difficult_node = obj.find("difficult")
        difficult = (difficult_node is not None and
                     int(difficult_node.text) == 1)
        if not keep_difficult and difficult:
            continue
        name = obj.find("name").text.lower().strip()
        bbox = obj.find("bndbox")
        pts = ["xmin", "ymin", "xmax", "ymax"]
        bndbox = []
        for i, pt in enumerate(pts):
            cur_pt = int(float(bbox.find(pt).text)) - 1
            cur_pt = cur_pt / width if i % 2 == 0 else cur_pt / height
            bndbox.append(cur_pt)
        bndbox.append(class_to_ind[name])
        res.append(bndbox)
    return res


class VOCDetection:
    """VOC-format dataset.

    Args:
      root: path to VOCdevkit (or the dir containing the subdir).
      image_sets: [(year_or_subdir, split)] — for the mask dataset the
        subdir is 'Mask' regardless of year (data/voc_mask.py:110).
      classes: class-name tuple (VOC_CLASSES or VOC_CLASSES_MASK).
      transform: callable (image, boxes, labels) -> same triple.
    """

    def __init__(self, root: str,
                 image_sets: Sequence[Tuple[str, str]] = (("2007", "trainval"),
                                                          ("2012", "trainval")),
                 classes: Sequence[str] = VOC_CLASSES,
                 transform=None,
                 subdir_fmt: str = "VOC{}",
                 keep_difficult: bool = False,
                 dataset_name: str = "VOC0712"):
        self.root = root
        self.classes = tuple(classes)
        self.class_to_ind = {c: i for i, c in enumerate(self.classes)}
        self.transform = transform
        self.keep_difficult = keep_difficult
        self.name = dataset_name
        self._annopath = osp.join("%s", "Annotations", "%s.xml")
        self._imgpath = osp.join("%s", "JPEGImages", "%s.jpg")
        self.ids: List[Tuple[str, str]] = []
        for (year, split) in image_sets:
            rootpath = osp.join(self.root, subdir_fmt.format(year))
            listfile = osp.join(rootpath, "ImageSets", "Main", split + ".txt")
            with open(listfile) as f:
                for line in f:
                    self.ids.append((rootpath, line.strip()))

    @classmethod
    def mask(cls, root: str, split: str = "train", transform=None):
        """The face-mask dataset variant (reference data/voc_mask.py)."""
        return cls(root, image_sets=((None, split),),
                   classes=VOC_CLASSES_MASK, transform=transform,
                   subdir_fmt="Mask", dataset_name="Mask")

    def __len__(self):
        return len(self.ids)

    def __getitem__(self, index):
        im, gt, _, _ = self.pull_item(index)
        return im, gt

    def reset_transform(self, transform):
        self.transform = transform

    def pull_item(self, index):
        """-> (image float32 HWC normalized, target [N,5], orig_h, orig_w)."""
        img_id = self.ids[index]
        root = ET.parse(self._annopath % img_id).getroot()
        img = cv2.imread(self._imgpath % img_id)
        height, width, _ = img.shape
        target = parse_voc_annotation(root, width, height, self.class_to_ind,
                                      self.keep_difficult)
        if self.transform is not None:
            target = np.asarray(target).reshape(-1, 5)
            img, boxes, labels = self.transform(
                img, target[:, :4], target[:, 4])
            target = np.hstack((boxes, np.expand_dims(labels, axis=1)))
        return img, target, height, width

    def pull_image(self, index):
        img_id = self.ids[index]
        return cv2.imread(self._imgpath % img_id, cv2.IMREAD_COLOR), img_id

    def pull_anno(self, index):
        img_id = self.ids[index]
        anno = ET.parse(self._annopath % img_id).getroot()
        gt = parse_voc_annotation(anno, 1, 1, self.class_to_ind,
                                  self.keep_difficult)
        return img_id[1], gt
