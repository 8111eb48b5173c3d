"""VOC mAP evaluation tests."""

import numpy as np
import pytest

from yolo_tpu.eval.voc_eval import VOCEvaluator, voc_ap, voc_eval_class


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    np.testing.assert_allclose(voc_ap(rec, prec, use_07_metric=True), 1.0)
    np.testing.assert_allclose(voc_ap(rec, prec, use_07_metric=False), 1.0)


def test_voc_ap_partial():
    # one TP then one FP over 2 GT: recall caps at 0.5
    rec = np.array([0.5, 0.5])
    prec = np.array([1.0, 0.5])
    ap07 = voc_ap(rec, prec, use_07_metric=True)
    np.testing.assert_allclose(ap07, 6 / 11, rtol=1e-6)  # t=0..0.5 get p=1


def test_voc_eval_class_perfect_detections():
    gts = [np.array([[10, 10, 50, 50], [60, 60, 90, 90]]),
           np.array([[0, 0, 20, 20]])]
    dets = [np.array([[10, 10, 50, 50, 0.9], [60, 60, 90, 90, 0.8]]),
            np.array([[0, 0, 20, 20, 0.95]])]
    ap = voc_eval_class(dets, gts)
    np.testing.assert_allclose(ap, 1.0)


def test_voc_eval_class_duplicate_is_fp():
    gts = [np.array([[10, 10, 50, 50]])]
    dets = [np.array([[10, 10, 50, 50, 0.9], [11, 11, 50, 50, 0.8]])]
    ap = voc_eval_class(dets, gts)
    assert 0.9 < ap <= 1.0 + 1e-9  # duplicate is FP but recall hits 1 first


def test_voc_eval_class_miss():
    gts = [np.array([[10, 10, 50, 50]])]
    dets = [np.array([[100, 100, 150, 150, 0.9]])]
    assert voc_eval_class(dets, gts) == 0.0


def test_voc_eval_difficult_ignored():
    gts = [np.array([[10, 10, 50, 50], [60, 60, 90, 90]])]
    difficult = [np.array([False, True])]
    dets = [np.array([[10, 10, 50, 50, 0.9], [60, 60, 90, 90, 0.8]])]
    # difficult GT: detection on it is ignored (not FP), npos excludes it
    ap = voc_eval_class(dets, gts, difficult)
    np.testing.assert_allclose(ap, 1.0)


def test_evaluator_with_oracle_detector():
    """A detector that returns the GT boxes scores mAP ~ 1."""
    from yolo_tpu.data import BaseTransform, SyntheticDetection

    ds = SyntheticDetection(size=(32, 32), num_classes=2, length=8,
                            transform=BaseTransform((32, 32)))
    ev = VOCEvaluator(ds, num_classes=2, input_size=(32, 32), batch_size=4)

    # oracle: look up GT for the images in each batch (sequential order)
    state = {"next": 0}

    def oracle(images):
        b = len(images)
        k = 8
        boxes = np.zeros((b, k, 4), np.float32)
        scores = np.zeros((b, k), np.float32)
        classes = np.full((b, k), -1, np.int32)
        valid = np.zeros((b, k), bool)
        for bi in range(b):
            _, t, _, _ = ds.pull_item(state["next"] + bi)
            t = np.asarray(t).reshape(-1, 5)
            for j, row in enumerate(t[:k]):
                boxes[bi, j] = row[:4]
                scores[bi, j] = 0.9
                classes[bi, j] = int(row[4])
                valid[bi, j] = True
        state["next"] += b
        return boxes, scores, classes, valid

    mean_ap = ev.evaluate(oracle)
    assert mean_ap > 0.99


def test_evaluator_device_cache_identical():
    """cache_device=True gives the identical mAP and GT tables as the
    uncached path (the multi-stage parity scripts rely on it to pay
    host generation + H2D once across ~15 stages)."""
    import jax

    from yolo_tpu.config import get_config
    from yolo_tpu.data import BaseTransform, SyntheticDetection
    from yolo_tpu.detector import Detector

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32),
                     conf_thresh=0.01)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    ds = SyntheticDetection((32, 32), num_classes=2, length=8,
                            transform=BaseTransform((32, 32)), seed=5)
    ev_plain = VOCEvaluator(ds, 2, (32, 32), batch_size=4)
    ev_cache = VOCEvaluator(ds, 2, (32, 32), batch_size=4,
                            cache_device=True)
    m0 = ev_plain.evaluate(lambda im: det.detect(params, im))
    m1 = ev_cache.evaluate(lambda im: det.detect(params, im))
    m2 = ev_cache.evaluate(lambda im: det.detect(params, im))  # cached
    assert m0 == m1 == m2
    for cls in range(2):
        for a, b in zip(ev_plain.raw[1][cls], ev_cache.raw[1][cls]):
            np.testing.assert_array_equal(a, b)


def test_fast_bootstrap_matches_slow_exactly():
    """The weighted-PR bootstrap (one matching pass + multiplicity
    weights) reproduces the expanded-image-list bootstrap replicate by
    replicate: per-image matching makes record tp/fp flags invariant
    under resampling, and every intra-block PR point is dominated by a
    block boundary."""
    from yolo_tpu.eval.voc_eval import (
        _map_from_matches, _precompute_matches, map_from_raw)

    rng = np.random.default_rng(7)
    n, C = 24, 2
    dets, gts = [], []
    for cls in range(C):
        d_cls, g_cls = [], []
        for i in range(n):
            ng = int(rng.integers(0, 4))
            g = np.zeros((ng, 4), np.float32)
            for j in range(ng):
                x, y = rng.uniform(0, 80, 2)
                g[j] = [x, y, x + rng.uniform(10, 40),
                        y + rng.uniform(10, 40)]
            nd = int(rng.integers(0, 5))
            d = np.zeros((nd, 5), np.float32)
            for j in range(nd):
                if ng and rng.random() < 0.6:  # near-hit of a random gt
                    b = g[int(rng.integers(0, ng))] + rng.uniform(-6, 6, 4)
                else:
                    x, y = rng.uniform(0, 80, 2)
                    b = [x, y, x + rng.uniform(10, 40),
                         y + rng.uniform(10, 40)]
                d[j] = list(b) + [rng.random()]  # continuous: no ties
            d_cls.append(d)
            g_cls.append(g)
        dets.append(d_cls)
        gts.append(g_cls)

    matches = _precompute_matches(dets, gts)
    for metric_07 in (True, False):
        for rep in range(5):
            idx = np.random.default_rng(rep).integers(0, n, n)
            slow = map_from_raw(dets, gts, list(idx), metric_07)
            mult = np.bincount(idx, minlength=n).astype(np.float64)
            fast = _map_from_matches(matches, mult, metric_07)
            assert slow == pytest.approx(fast, abs=1e-12), (
                metric_07, rep)
