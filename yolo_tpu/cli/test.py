"""Visual test entry point (reference test.py equivalent): run detection
over a dataset, draw boxes, write jpgs to output/.

python -m yolo_tpu.cli.test -v slim_yolo_v2 -d synthetic --num_images 8
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from yolo_tpu.cli.common import add_common_args, build_cfg, build_dataset
from yolo_tpu.cli.eval import load_params
from yolo_tpu.detector import Detector

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="yolo_tpu visual test")
    add_common_args(parser)
    parser.add_argument("--trained_model", default=None)
    parser.add_argument("--visual_threshold", type=float, default=0.3)
    parser.add_argument("--num_images", type=int, default=16)
    parser.add_argument("--output", default="output/")
    parser.add_argument("-q", "--quantize", action="store_true",
                        default=False)
    return parser.parse_args(argv)


def vis(img, boxes, scores, cls_inds, class_names, thresh, scale):
    """Draw detections (reference test.py:34-68)."""
    img = img.copy()
    rng = np.random.default_rng(5)
    colors = [tuple(int(c) for c in rng.integers(0, 255, 3))
              for _ in class_names]
    for box, score, cls in zip(boxes, scores, cls_inds):
        if score < thresh:
            continue
        x1, y1, x2, y2 = (box * scale).astype(int)
        cls = int(cls)
        cv2.rectangle(img, (x1, y1), (x2, y2), colors[cls], 2)
        label = f"{class_names[cls]}: {score:.2f}"
        cv2.putText(img, label, (x1, max(y1 - 5, 0)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, colors[cls], 1)
    return img


def test(args=None):
    args = args or parse_args()
    cfg = build_cfg(args)
    det = Detector(cfg, batch_norm=not args.version.endswith("_q_bf"))
    params = load_params(args, det)
    dataset = build_dataset(args, cfg, train=False)
    os.makedirs(args.output, exist_ok=True)

    if args.dataset == "synthetic":
        class_names = [f"class{i}" for i in range(cfg.num_classes)]
    elif args.dataset == "mask":
        from yolo_tpu.data.voc import VOC_CLASSES_MASK as class_names
    else:
        from yolo_tpu.data.voc import VOC_CLASSES as class_names

    # -q: run the INT8 integer engine visually (the reference's
    # slim_yolo_v2_q_bf test branch, test.py:165-172) — dispatched on
    # -v so every family's integer engine works here, not just slim.
    detect_one = None
    if args.quantize:
        from yolo_tpu.quant.dispatch import build_int8_detector
        calib = [np.stack([dataset.pull_item(i)[0] for i in
                           range(min(16, len(dataset)))])]
        _, int8_detect = build_int8_detector(args.version, params, cfg,
                                             calib)

        def detect_one(im):
            boxes, scores, classes, valid = (
                np.asarray(a) for a in
                int8_detect(np.asarray(im, np.float32)[None]))
            keep = valid[0]
            return boxes[0][keep], scores[0][keep], classes[0][keep]

    n = min(args.num_images, len(dataset))
    import time
    for i in range(n):
        im, _, h, w = dataset.pull_item(i)
        raw, _ = dataset.pull_image(i)
        t0 = time.time()
        if detect_one is not None:
            boxes, scores, cls_inds = detect_one(im)
        else:
            boxes, scores, cls_inds = det.detect_single_numpy(params, im)
        print(f"im {i}: detection time {time.time() - t0:.3f}s, "
              f"{len(scores)} boxes")
        out = vis(raw, boxes, scores, cls_inds, class_names,
                  args.visual_threshold, np.array([w, h, w, h]))
        cv2.imwrite(os.path.join(args.output, f"{i}.jpg"), out)
    print(f"wrote {n} images to {args.output}")


if __name__ == "__main__":
    test()
