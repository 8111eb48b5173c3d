"""YOLO loss, pure JAX. Semantics parity with reference tools.py:392-435.

Components (all "sum over anchors, mean over batch"):
- objectness: masked MSE (pos weight 5.0, neg weight 1.0) on
  sigmoid(conf) vs the decoded-box/GT IoU target, ignoring slots whose
  objectness label is -1 (the ignore anchors).
- class: softmax cross-entropy on positive slots.
- box: BCE-with-logits on (tx, ty), MSE on (tw, th), both scaled by the
  per-box size weight (2 - area fraction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_score(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of corner boxes [..., 4]
    (reference tools.iou_score, tools.py:377-389)."""
    tl = jnp.maximum(boxes_a[..., :2], boxes_b[..., :2])
    br = jnp.minimum(boxes_a[..., 2:], boxes_b[..., 2:])
    area_a = jnp.prod(boxes_a[..., 2:] - boxes_a[..., :2], axis=-1)
    area_b = jnp.prod(boxes_b[..., 2:] - boxes_b[..., :2], axis=-1)
    en = jnp.all(tl < br, axis=-1).astype(boxes_a.dtype)
    area_i = jnp.prod(br - tl, axis=-1) * en
    # epsilon guards the all-zero (no-GT) slots; the reference relies on
    # pred areas never being exactly zero.
    return area_i / (area_a + area_b - area_i + 1e-20)


def _bce_with_logits(x, z):
    # stable: max(x,0) - x*z + log(1 + exp(-|x|))
    return jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _bce_prob(p, z):
    eps = 1e-14
    return -(z * jnp.log(p + eps) + (1.0 - z) * jnp.log(1.0 - p + eps))


def yolo_loss(conf_pred, cls_pred, txtytwth_pred, boxes_norm_pred, gt_tensor,
              num_classes: int, obj_loss_f: str = "mse"):
    """Compute (conf_loss, cls_loss, txtytwth_loss, total_loss).

    Args:
      conf_pred: [B, N, 1] objectness logits.
      cls_pred: [B, N, C] class logits.
      txtytwth_pred: [B, N, 4] raw box offsets.
      boxes_norm_pred: [B, N, 4] decoded corner boxes normalized to [0, 1]
        (already stop-gradient), used to build the IoU conf target the way
        the reference does in-forward (models/slim_yolo_v2.py:601-616).
      gt_tensor: [B, N, 11] from yolo_tpu.train.targets.
    """
    gt = gt_tensor.astype(jnp.float32)
    gt_obj = gt[:, :, 0]
    gt_cls = gt[:, :, 1].astype(jnp.int32)
    gt_txtytwth = gt[:, :, 2:6]
    gt_weight = gt[:, :, 6]
    gt_boxes = gt[:, :, 7:11]

    # conf target = IoU(decoded pred box, gt box); zero where no gt box.
    gt_conf = jax.lax.stop_gradient(iou_score(boxes_norm_pred, gt_boxes))

    pred_conf = jax.nn.sigmoid(conf_pred[:, :, 0])
    pos_id = (gt_obj == 1.0).astype(jnp.float32)
    neg_id = (gt_obj == 0.0).astype(jnp.float32)

    if obj_loss_f == "mse":
        # yolov2-style (reference tools.MSELoss + weights 5/1)
        pos_loss = jnp.mean(jnp.sum(pos_id * (pred_conf - gt_conf) ** 2,
                                    axis=1))
        neg_loss = jnp.mean(jnp.sum(neg_id * pred_conf ** 2, axis=1))
        conf_loss = 5.0 * pos_loss + 1.0 * neg_loss
    elif obj_loss_f == "bce":
        pos_loss = jnp.mean(jnp.sum(
            pos_id * _bce_prob(pred_conf, gt_conf), axis=1))
        neg_loss = jnp.mean(jnp.sum(
            neg_id * _bce_prob(pred_conf, jnp.zeros_like(pred_conf)), axis=1))
        conf_loss = pos_loss + neg_loss
    else:
        raise ValueError(f"unknown obj_loss_f {obj_loss_f!r}")

    gt_mask = (gt_weight > 0.0).astype(jnp.float32)

    # class loss: CE on positives
    log_probs = jax.nn.log_softmax(cls_pred, axis=-1)
    ce = -jnp.take_along_axis(log_probs, gt_cls[..., None], axis=-1)[..., 0]
    cls_loss = jnp.mean(jnp.sum(ce * gt_mask, axis=1))

    # box loss
    txty_l = jnp.sum(_bce_with_logits(txtytwth_pred[:, :, :2],
                                      gt_txtytwth[:, :, :2]), axis=2)
    twth_l = jnp.sum((txtytwth_pred[:, :, 2:] - gt_txtytwth[:, :, 2:]) ** 2,
                     axis=2)
    txty_loss = jnp.mean(jnp.sum(txty_l * gt_weight * gt_mask, axis=1))
    twth_loss = jnp.mean(jnp.sum(twth_l * gt_weight * gt_mask, axis=1))
    txtytwth_loss = txty_loss + twth_loss

    total_loss = conf_loss + cls_loss + txtytwth_loss
    return conf_loss, cls_loss, txtytwth_loss, total_loss
