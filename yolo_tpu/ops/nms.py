"""Detection postprocess: confidence threshold + class-wise greedy NMS.

Two implementations with identical semantics:

- ``postprocess_numpy``: a host-side oracle with exactly the reference's
  semantics (models/slim_yolo_v2.py:145-210) — used for parity tests and
  as the evaluator's reference path.
- ``postprocess_jax`` / ``batched_postprocess``: a fixed-shape, fully
  in-graph version (top-k + masked greedy NMS inside jit) so that the whole
  detect pipeline — backbone, decode, NMS — compiles to ONE XLA program.
  The reference instead leaves the device for a pure-Python NMS loop with an
  implicit batch-size-1 assumption (models/slim_yolo_v2.py:348-356); the
  in-graph rewrite is what makes batched TPU serving fast.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Numpy oracle (reference semantics, single image).
# ---------------------------------------------------------------------------


def nms_greedy_numpy(dets: np.ndarray, scores: np.ndarray,
                     nms_thresh: float):
    """Pure-numpy greedy NMS, identical math to the reference baseline
    (models/slim_yolo_v2.py:145-174): areas without +1, intersection
    w/h floored at 1e-28, keep boxes with overlap <= thresh."""
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(1e-28, xx2 - xx1)
        h = np.maximum(1e-28, yy2 - yy1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= nms_thresh)[0]
        order = order[inds + 1]
    return keep


def postprocess_numpy(bbox_pred: np.ndarray, prob_pred: np.ndarray,
                      num_classes: int, conf_thresh: float,
                      nms_thresh: float):
    """Reference postprocess (models/slim_yolo_v2.py:176-210): argmax class,
    conf threshold, class-wise NMS, return (boxes, scores, cls_inds)."""
    cls_inds = np.argmax(prob_pred, axis=1)
    scores = prob_pred[np.arange(prob_pred.shape[0]), cls_inds].copy()

    keep = np.where(scores >= conf_thresh)
    bbox_pred = bbox_pred[keep]
    scores = scores[keep]
    cls_inds = cls_inds[keep]

    keep = np.zeros(len(bbox_pred), dtype=np.int64)
    for i in range(num_classes):
        inds = np.where(cls_inds == i)[0]
        if len(inds) == 0:
            continue
        c_keep = nms_greedy_numpy(bbox_pred[inds], scores[inds], nms_thresh)
        keep[inds[c_keep]] = 1

    keep = np.where(keep > 0)
    return bbox_pred[keep], scores[keep], cls_inds[keep]


# ---------------------------------------------------------------------------
# In-graph fixed-shape postprocess.
# ---------------------------------------------------------------------------


def _pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """[K, 4] corner boxes -> [K, K] IoU with the reference's NMS math."""
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    areas = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(1e-28, xx2 - xx1)
    h = jnp.maximum(1e-28, yy2 - yy1)
    inter = w * h
    return inter / (areas[:, None] + areas[None, :] - inter)


def postprocess_jax(boxes: jnp.ndarray, class_probs: jnp.ndarray,
                    conf_thresh: float, nms_thresh: float,
                    pre_nms_top_k: int = 512, top_k: int = 100,
                    mode: str = "greedy", topk_method: str = "exact"):
    """Single-image in-graph postprocess.

    Args:
      boxes: [N, 4] corner boxes.
      class_probs: [N, C] per-class confidences (softmax(cls) * sigmoid(obj)).
      topk_method: "exact" (lax.top_k full sort) or "approx"
        (lax.approx_max_k — the TPU-native partial-reduction primitive;
        with aggregate_to_topk the returned k are sorted, so the greedy
        loop's score order is preserved; only which candidates make the
        pre-NMS cut can differ, and only among near-threshold scores).
    Returns:
      (boxes [top_k, 4], scores [top_k], classes [top_k] int32,
       valid [top_k] bool) — fixed shapes, invalid slots zeroed.
    """
    n, _ = class_probs.shape
    k = min(pre_nms_top_k, n)

    scores_all = jnp.max(class_probs, axis=1)
    cls_all = jnp.argmax(class_probs, axis=1).astype(jnp.int32)

    # Pre-NMS top-k candidates by best-class score, then score-descending —
    # exactly the order the greedy loop needs.
    if topk_method == "approx":
        scores, idx = jax.lax.approx_max_k(scores_all, k,
                                           recall_target=0.99)
    else:
        scores, idx = jax.lax.top_k(scores_all, k)
    cand_boxes = boxes[idx]
    cand_cls = cls_all[idx]
    valid = scores >= conf_thresh

    iou = _pairwise_iou(cand_boxes)
    same_cls = cand_cls[:, None] == cand_cls[None, :]
    # suppress[j, i]: candidate j (higher score) suppresses candidate i.
    suppress = (iou > nms_thresh) & same_cls
    lower_tri = jnp.tril(jnp.ones((k, k), bool), k=-1)  # j < i positions

    if mode == "greedy":
        # Exact greedy NMS (reference semantics) as a Jacobi fixpoint
        # instead of a k-step sequential scan. The suppression relation
        # (j suppresses i only when j < i in score order) is a DAG, so
        # iterating keep[i] = valid[i] & ~any_j(keep[j] & sup[j,i])
        # stabilizes nodes in order of suppression-chain depth: after t
        # sweeps every chain of length <= t is final, and real data
        # converges in ~3-6 sweeps rather than k=256 loop steps. The
        # fixpoint equals the greedy solution exactly.
        sup_lower = suppress & lower_tri.T  # sup_lower[j, i]: j < i

        def cond(st):
            keep, prev, it = st
            return jnp.logical_and(it < k, jnp.any(keep != prev))

        def body(st):
            keep, _, it = st
            hit = jax.lax.dot_general(
                keep.astype(jnp.int8)[None], sup_lower.astype(jnp.int8),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)[0] > 0
            return valid & ~hit, keep, it + 1

        keep0 = valid
        keep, _, _ = jax.lax.while_loop(
            cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    elif mode == "fast":
        # YOLACT-style fast NMS: one parallel matrix reduction — a box is
        # kept iff no higher-scored same-class box overlaps it, whether or
        # not that box itself survives. Slightly over-suppresses vs greedy
        # but has no sequential dependency (serving-latency option).
        sup = jnp.any(suppress & lower_tri.T, axis=0)  # any j<i suppressor
        keep = valid & ~sup
    else:
        raise ValueError(f"unknown nms mode {mode!r}")

    final_scores = jnp.where(keep, scores, 0.0)
    out_scores, out_idx = jax.lax.top_k(final_scores, min(top_k, k))
    out_valid = out_scores > 0.0
    out_boxes = jnp.where(out_valid[:, None], cand_boxes[out_idx], 0.0)
    out_cls = jnp.where(out_valid, cand_cls[out_idx], -1)
    if top_k > k:  # fixed output budget even for tiny inputs
        pad = top_k - k
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        out_cls = jnp.pad(out_cls, (0, pad), constant_values=-1)
        out_valid = jnp.pad(out_valid, (0, pad))
    return out_boxes, out_scores, out_cls, out_valid


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def batched_postprocess(boxes, class_probs, conf_thresh, nms_thresh,
                        pre_nms_top_k=512, top_k=100, mode="greedy",
                        topk_method="exact"):
    """vmapped postprocess over the batch: [B, N, 4] x [B, N, C] ->
    fixed-shape (boxes [B, K, 4], scores [B, K], classes [B, K],
    valid [B, K])."""
    fn = partial(postprocess_jax, conf_thresh=conf_thresh,
                 nms_thresh=nms_thresh, pre_nms_top_k=pre_nms_top_k,
                 top_k=top_k, mode=mode, topk_method=topk_method)
    return jax.vmap(fn)(boxes, class_probs)
