"""VOC mAP evaluation (AP@0.5, 11-point or continuous metric).

Same evaluation protocol as the reference evaluators
(utils/vocapi_evaluator_mask.py:158-231 and the classic voc_eval): per
class, detections across the dataset are score-sorted and greedily
matched to GT at IoU>=0.5; difficult GT boxes are ignored; AP is the
11-point interpolated metric by default (use_07_metric).

Unlike the reference (single-image model forwards with an in-Python NMS),
the evaluator here runs the detector *batched* on device and only does
the bookkeeping on host.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def voc_ap(rec: np.ndarray, prec: np.ndarray,
           use_07_metric: bool = True) -> float:
    """Average precision given recall/precision curves."""
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            p = 0.0 if np.sum(rec >= t) == 0 else np.max(prec[rec >= t])
            ap += p / 11.0
        return float(ap)
    mrec = np.concatenate(([0.0], rec, [1.0]))
    mpre = np.concatenate(([0.0], prec, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    i = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[i + 1] - mrec[i]) * mpre[i + 1]))


def match_records(dets_per_image: List[np.ndarray],
                  gts_per_image: List[np.ndarray],
                  difficult_per_image: Optional[List[np.ndarray]] = None,
                  ovthresh: float = 0.5):
    """One greedy matching pass for a class.

    Returns (img [D] int32, tp [D], fp [D], npos_per_image [N]) in
    global score-sorted order. Matching is PER IMAGE (a detection only
    competes for GT boxes of its own image), so the per-record tp/fp
    flags are invariant under image resampling — the property the fast
    bootstrap below exploits.
    """
    n_images = len(dets_per_image)
    if difficult_per_image is None:
        difficult_per_image = [
            np.zeros(len(g), bool) for g in gts_per_image]

    npos_i = np.array([int((~d).sum()) for d in difficult_per_image],
                      np.float64)
    matched = [np.zeros(len(g), bool) for g in gts_per_image]

    records = []  # (score, image_idx, box)
    for i in range(n_images):
        for det in np.asarray(dets_per_image[i]).reshape(-1, 5):
            records.append((det[4], i, det[:4]))
    if not records:
        z = np.zeros(0)
        return z.astype(np.int32), z, z, npos_i
    records.sort(key=lambda r: -r[0])

    img = np.zeros(len(records), np.int32)
    tp = np.zeros(len(records))
    fp = np.zeros(len(records))
    for k, (score, i, bb) in enumerate(records):
        img[k] = i
        gts = np.asarray(gts_per_image[i]).reshape(-1, 4)
        ovmax, jmax = -np.inf, -1
        if len(gts) > 0:
            ixmin = np.maximum(gts[:, 0], bb[0])
            iymin = np.maximum(gts[:, 1], bb[1])
            ixmax = np.minimum(gts[:, 2], bb[2])
            iymax = np.minimum(gts[:, 3], bb[3])
            iw = np.maximum(ixmax - ixmin, 0.0)
            ih = np.maximum(iymax - iymin, 0.0)
            inters = iw * ih
            uni = ((bb[2] - bb[0]) * (bb[3] - bb[1]) +
                   (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1]) -
                   inters)
            overlaps = inters / np.maximum(uni, 1e-10)
            jmax = int(np.argmax(overlaps))
            ovmax = overlaps[jmax]
        if ovmax > ovthresh:
            if difficult_per_image[i][jmax]:
                continue  # ignore
            if not matched[i][jmax]:
                tp[k] = 1.0
                matched[i][jmax] = True
            else:
                fp[k] = 1.0
        else:
            fp[k] = 1.0
    return img, tp, fp, npos_i


def voc_eval_class(dets_per_image: List[np.ndarray],
                   gts_per_image: List[np.ndarray],
                   difficult_per_image: Optional[List[np.ndarray]] = None,
                   ovthresh: float = 0.5,
                   use_07_metric: bool = True,
                   return_pr: bool = False):
    """AP for one class (optionally with the recall/precision curves).

    Args:
      dets_per_image: per image [N, 5] arrays (x1, y1, x2, y2, score) in
        pixels.
      gts_per_image: per image [M, 4] GT boxes in pixels.
      difficult_per_image: per image [M] bool (ignored GT), default none.
    """
    img, tp, fp, npos_i = match_records(
        dets_per_image, gts_per_image, difficult_per_image, ovthresh)
    if img.size == 0:
        empty = np.zeros(0)
        return (0.0, empty, empty) if return_pr else 0.0
    npos = float(npos_i.sum())
    fp = np.cumsum(fp)
    tp = np.cumsum(tp)
    rec = tp / np.maximum(npos, 1e-10)
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    ap = voc_ap(rec, prec, use_07_metric)
    return (ap, rec, prec) if return_pr else ap


def _weighted_ap(img, tp, fp, npos_i, mult, use_07_metric: bool) -> float:
    """AP of a bootstrap replicate from ONE precomputed matching pass.

    ``mult[i]`` is image i's multiplicity in the replicate. Exactly
    equals AP over the expanded image list: copies of a record are
    score-adjacent (stable tie order), and every intra-block PR point is
    dominated by a block-boundary point, so the max/envelope in voc_ap
    is unchanged — while each replicate drops from O(D · matching) to
    O(D)."""
    npos = float(mult @ npos_i)
    if img.size == 0:
        return 0.0
    w = mult[img]
    tpc = np.cumsum(tp * w)
    fpc = np.cumsum(fp * w)
    rec = tpc / np.maximum(npos, 1e-10)
    prec = tpc / np.maximum(tpc + fpc, np.finfo(np.float64).eps)
    return voc_ap(rec, prec, use_07_metric)


def map_from_raw(dets, gts, image_idx: Optional[Sequence[int]] = None,
                 use_07_metric: bool = True) -> float:
    """mAP from raw per-class/per-image detections and GTs, optionally
    restricted to a (possibly repeating) list of image indices — the
    resampling primitive for the bootstrap CIs below."""
    num_classes = len(dets)
    aps = []
    for cls in range(num_classes):
        if image_idx is None:
            d, g = dets[cls], gts[cls]
        else:
            d = [dets[cls][i] for i in image_idx]
            g = [gts[cls][i] for i in image_idx]
        aps.append(voc_eval_class(d, g, use_07_metric=use_07_metric))
    return float(np.mean(aps))


def _precompute_matches(dets, gts):
    """Per-class match_records for the fast bootstrap."""
    return [match_records(dets[cls], gts[cls])
            for cls in range(len(dets))]


def _map_from_matches(matches, mult, use_07_metric: bool) -> float:
    return float(np.mean([
        _weighted_ap(img, tp, fp, npos_i, mult, use_07_metric)
        for img, tp, fp, npos_i in matches]))


def bootstrap_map_ci(dets, gts, n_boot: int = 500, seed: int = 0,
                     alpha: float = 0.05, use_07_metric: bool = True):
    """Percentile bootstrap CI on mAP (resampling IMAGES with
    replacement). Returns (map, lo, hi)."""
    n = len(dets[0])
    rng = np.random.default_rng(seed)
    matches = _precompute_matches(dets, gts)
    stats = np.empty(n_boot)
    for b in range(n_boot):
        mult = np.bincount(rng.integers(0, n, n),
                           minlength=n).astype(np.float64)
        stats[b] = _map_from_matches(matches, mult, use_07_metric)
    lo, hi = np.quantile(stats, [alpha / 2, 1 - alpha / 2])
    return (map_from_raw(dets, gts, None, use_07_metric),
            float(lo), float(hi))


def bootstrap_delta_ci(dets_a, dets_b, gts, n_boot: int = 500,
                       seed: int = 0, alpha: float = 0.05,
                       use_07_metric: bool = True):
    """PAIRED percentile-bootstrap CI on mAP(a) - mAP(b).

    The same resampled image set scores both stages in each replicate,
    so shared per-image difficulty cancels — the right statistic for the
    reference's <=0.5-mAP-drop acceptance bar (BASELINE.md), which is a
    statement about the *delta*, not the absolute mAPs. Returns
    (delta, lo, hi) in mAP points (x100 of the raw fraction is up to the
    caller)."""
    n = len(gts[0])
    rng = np.random.default_rng(seed)
    # one matching pass per (stage, class); each replicate is then an
    # O(D) weighted PR sweep instead of a full re-match — a 2048-image
    # 300-replicate CI drops from ~7 min to well under a second, exactly
    # (see _weighted_ap)
    m_a = _precompute_matches(dets_a, gts)
    m_b = _precompute_matches(dets_b, gts)
    stats = np.empty(n_boot)
    for b in range(n_boot):
        mult = np.bincount(rng.integers(0, n, n),
                           minlength=n).astype(np.float64)
        stats[b] = (_map_from_matches(m_a, mult, use_07_metric) -
                    _map_from_matches(m_b, mult, use_07_metric))
    lo, hi = np.quantile(stats, [alpha / 2, 1 - alpha / 2])
    delta = (map_from_raw(dets_a, gts, None, use_07_metric) -
             map_from_raw(dets_b, gts, None, use_07_metric))
    return float(delta), float(lo), float(hi)


class VOCEvaluator:
    """mAP evaluator over any dataset with pull_item/pull_anno.

    ``detect_batch(images) -> (boxes_norm [B,K,4], scores [B,K],
    classes [B,K], valid [B,K])`` is the batched in-graph detector; images
    are pre-transformed to the evaluator's input size.
    """

    def __init__(self, dataset, num_classes: int, input_size,
                 batch_size: int = 32, use_07_metric: bool = True,
                 display: bool = False, output_dir: Optional[str] = None,
                 class_names: Optional[Sequence[str]] = None,
                 cache_device: bool = False):
        self.dataset = dataset
        self.num_classes = num_classes
        self.input_size = tuple(input_size)
        self.batch_size = batch_size
        self.use_07_metric = use_07_metric
        self.display = display
        self.output_dir = output_dir
        self.class_names = (list(class_names) if class_names else
                            [f"class{i}" for i in range(num_classes)])
        self.map = None
        # cache_device: after the first pass, keep the transformed float32
        # batches ON DEVICE and the GT tables on host, so multi-stage
        # parity evals pay host generation + transform + H2D exactly once
        # (the tunnel moves ~2 MB/image at 416² — 15 stages x 2048 images
        # is minutes of pure transfer otherwise). The stage detect fns
        # receive jnp arrays; jitted fns consume them directly.
        self.cache_device = cache_device
        self._dev_cache = None

    def evaluate(self, detect_batch: Callable) -> float:
        """Single pass over the dataset: each pull_item feeds both the GT
        table and the detection batch (the reference decoded every image
        twice, once per loop — vocapi_evaluator_mask.py:59,69)."""
        n = len(self.dataset)
        dets: List[List[np.ndarray]] = [
            [np.empty((0, 5), np.float32) for _ in range(n)]
            for _ in range(self.num_classes)]

        if self._dev_cache is not None:
            batches, gts = self._dev_cache
        else:
            gts = [
                [np.empty((0, 4), np.float32) for _ in range(n)]
                for _ in range(self.num_classes)]
            batches = []
            for start in range(0, n, self.batch_size):
                idx = range(start, min(start + self.batch_size, n))
                batch_imgs = []
                batch_sizes = []
                for i in idx:
                    img, target, h, w = self.dataset.pull_item(i)
                    batch_imgs.append(img)
                    batch_sizes.append((h, w))
                    t = np.asarray(target).reshape(-1, 5)
                    for cls in range(self.num_classes):
                        rows = t[t[:, 4] == cls]
                        if len(rows):
                            gts[cls][i] = rows[:, :4] * [w, h, w, h]
                # Pad the final partial batch to batch_size so the jitted
                # detect fn sees ONE static shape (a ragged tail would
                # force an extra XLA compile per dataset size); padded
                # rows are simply never read back.
                while len(batch_imgs) < self.batch_size:
                    batch_imgs.append(np.zeros_like(batch_imgs[0]))
                stacked = np.stack(batch_imgs).astype(np.float32)
                if self.cache_device:
                    import jax.numpy as jnp
                    stacked = jnp.asarray(stacked)
                batches.append((idx, stacked, batch_sizes))
            if self.cache_device:
                self._dev_cache = (batches, gts)

        for idx, stacked, batch_sizes in batches:
            boxes, scores, classes, valid = (
                np.asarray(a) for a in detect_batch(stacked))
            for bi, i in enumerate(idx):
                h, w = batch_sizes[bi]
                scale = np.array([w, h, w, h], np.float32)
                for k in np.where(valid[bi])[0]:
                    cls = int(classes[bi, k])
                    det = np.concatenate(
                        [boxes[bi, k] * scale, [scores[bi, k]]])
                    dets[cls][i] = np.vstack(
                        [dets[cls][i], det[None].astype(np.float32)])
            if self.display and idx[0] % (20 * self.batch_size) == 0:
                print(f"im_detect: {idx[0]}/{n}")

        aps = []
        pr_curves = {}
        for cls in range(self.num_classes):
            ap, rec, prec = voc_eval_class(
                dets[cls], gts[cls], use_07_metric=self.use_07_metric,
                return_pr=True)
            aps.append(ap)
            pr_curves[self.class_names[cls]] = {
                "ap": ap, "rec": rec, "prec": prec}
            if self.display:
                print(f"AP[{self.class_names[cls]}] = {ap:.4f}")
        self.map = float(np.mean(aps))
        self.class_aps = aps
        self.pr_curves = pr_curves
        # raw per-class/per-image detections + GTs, for the bootstrap
        # CI helpers above (map_from_raw / bootstrap_delta_ci)
        self.raw = (dets, gts)
        if self.output_dir:
            self._persist(dets, pr_curves)
        return self.map

    def _image_id(self, i: int) -> str:
        """Real dataset image id for det-file artifacts (the reference
        writes actual VOC ids, vocapi_evaluator_mask.py:147 — index-only
        files are not consumable by the VOC devkit)."""
        ids = getattr(self.dataset, "ids", None)
        if ids is not None and i < len(ids):
            id_ = ids[i]
            if isinstance(id_, (tuple, list)):
                id_ = id_[-1]
            return str(id_)
        return f"{i:06d}"

    def _persist(self, dets, pr_curves):
        """Write the reference evaluator's artifacts
        (vocapi_evaluator_mask.py:59,89-90,140-155): VOC-format per-class
        det files, a detections.pkl of everything, and per-class PR
        pickles."""
        import os
        import pickle

        os.makedirs(self.output_dir, exist_ok=True)
        for cls, name in enumerate(self.class_names):
            path = os.path.join(self.output_dir, f"det_test_{name}.txt")
            with open(path, "w") as f:
                for i, rows in enumerate(dets[cls]):
                    img_id = self._image_id(i)
                    for x1, y1, x2, y2, score in np.asarray(rows):
                        # VOC det format: id score x1 y1 x2 y2 (1-based)
                        f.write(f"{img_id} {score:.6f} {x1 + 1:.1f} "
                                f"{y1 + 1:.1f} {x2 + 1:.1f} {y2 + 1:.1f}\n")
        with open(os.path.join(self.output_dir, "detections.pkl"),
                  "wb") as f:
            pickle.dump(dets, f, pickle.HIGHEST_PROTOCOL)
        for name, pr in pr_curves.items():
            with open(os.path.join(self.output_dir, f"{name}_pr.pkl"),
                      "wb") as f:
                pickle.dump(pr, f, pickle.HIGHEST_PROTOCOL)
