"""Loss + GT-builder parity against a torch oracle implementing the
reference semantics (tools.py:392-435) independently."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from yolo_tpu.config import get_config
from yolo_tpu.train.loss import iou_score, yolo_loss
from yolo_tpu.train.targets import build_targets, gt_creator, multi_gt_creator


def torch_loss_oracle(pred_conf, pred_cls, pred_txtytwth, label, num_classes):
    """Reference tools.loss semantics, written against torch primitives."""
    pred_conf = torch.sigmoid(pred_conf[:, :, 0])
    pred_cls = pred_cls.permute(0, 2, 1)
    txty_pred = pred_txtytwth[:, :, :2]
    twth_pred = pred_txtytwth[:, :, 2:]

    gt_conf = label[:, :, 0].float()
    gt_obj = label[:, :, 1].float()
    gt_cls = label[:, :, 2].long()
    gt_txtytwth = label[:, :, 3:-1].float()
    gt_box_scale_weight = label[:, :, -1]
    gt_mask = (gt_box_scale_weight > 0.0).float()

    pos_id = (gt_obj == 1.0).float()
    neg_id = (gt_obj == 0.0).float()
    pos_loss = torch.mean(torch.sum(pos_id * (pred_conf - gt_conf) ** 2, 1))
    neg_loss = torch.mean(torch.sum(neg_id * pred_conf ** 2, 1))
    conf_loss = 5.0 * pos_loss + 1.0 * neg_loss

    ce = nn.CrossEntropyLoss(reduction="none")(pred_cls, gt_cls)
    cls_loss = torch.mean(torch.sum(ce * gt_mask, 1))

    txty = nn.BCEWithLogitsLoss(reduction="none")(
        txty_pred, gt_txtytwth[:, :, :2])
    twth = nn.MSELoss(reduction="none")(twth_pred, gt_txtytwth[:, :, 2:])
    txty_loss = torch.mean(torch.sum(
        torch.sum(txty, 2) * gt_box_scale_weight * gt_mask, 1))
    twth_loss = torch.mean(torch.sum(
        torch.sum(twth, 2) * gt_box_scale_weight * gt_mask, 1))
    total = conf_loss + cls_loss + txty_loss + twth_loss
    return (conf_loss.item(), cls_loss.item(),
            (txty_loss + twth_loss).item(), total.item())


def test_yolo_loss_matches_torch_oracle(rng):
    b, n, c = 3, 50, 4
    conf = rng.standard_normal((b, n, 1)).astype(np.float32)
    cls = rng.standard_normal((b, n, c)).astype(np.float32)
    txt = rng.standard_normal((b, n, 4)).astype(np.float32)
    boxes_pred = np.sort(rng.random((b, n, 2, 2)), axis=2).reshape(
        b, n, 4)[..., [0, 2, 1, 3]].astype(np.float32)

    # build a gt tensor: ~20% positives, some ignores
    gt = np.zeros((b, n, 11))
    kind = rng.random((b, n))
    pos = kind < 0.2
    ign = (kind >= 0.2) & (kind < 0.3)
    gt[pos, 0] = 1.0
    gt[ign, 0] = -1.0
    gt[ign, 6] = -1.0
    gt[pos, 1] = rng.integers(0, c, pos.sum())
    gt[pos, 2:6] = rng.random((pos.sum(), 4))
    gt[pos, 6] = 1.0 + rng.random(pos.sum())
    raw_boxes = np.sort(rng.random((int(pos.sum()), 2, 2)), axis=1)
    gt[pos, 7:] = raw_boxes.reshape(-1, 4)[:, [0, 2, 1, 3]]

    got = yolo_loss(jnp.asarray(conf), jnp.asarray(cls), jnp.asarray(txt),
                    jnp.asarray(boxes_pred), jnp.asarray(gt), c)

    # oracle path: torch, with iou target precomputed like the reference
    # forward does (models/slim_yolo_v2.py:601-616)
    iou = np.asarray(iou_score(jnp.asarray(boxes_pred),
                               jnp.asarray(gt[:, :, 7:], dtype=jnp.float32)))
    label = np.concatenate([iou[..., None], gt[:, :, :7]], axis=2)
    want = torch_loss_oracle(
        torch.from_numpy(conf), torch.from_numpy(cls), torch.from_numpy(txt),
        torch.from_numpy(label).float(), c)

    for g, w in zip(got, want):
        np.testing.assert_allclose(float(g), w, rtol=2e-4, atol=2e-4)


def test_iou_score_matches_torch(rng):
    a = np.sort(rng.random((30, 2, 2)), axis=1).reshape(30, 4)[
        :, [0, 2, 1, 3]].astype(np.float32)
    b = np.sort(rng.random((30, 2, 2)), axis=1).reshape(30, 4)[
        :, [0, 2, 1, 3]].astype(np.float32)
    got = np.asarray(iou_score(jnp.asarray(a), jnp.asarray(b)))

    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    tl = torch.max(ta[:, :2], tb[:, :2])
    br = torch.min(ta[:, 2:], tb[:, 2:])
    area_a = torch.prod(ta[:, 2:] - ta[:, :2], 1)
    area_b = torch.prod(tb[:, 2:] - tb[:, :2], 1)
    en = (tl < br).type(tl.type()).prod(dim=1)
    area_i = torch.prod(br - tl, 1) * en
    want = (area_i / (area_a + area_b - area_i)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gt_creator_single_positive():
    labels = [np.array([[0.25, 0.25, 0.75, 0.75, 1.0]])]
    anchors = ((1.0, 1.0), (4.0, 4.0), (12.0, 12.0))
    gt = gt_creator((160, 160), 16, labels, anchors)
    assert gt.shape == (1, 10 * 10 * 3, 11)
    pos = gt[0, :, 0] == 1.0
    assert pos.sum() == 1  # exactly one best anchor
    row = gt[0, pos][0]
    # box is 80px = 5 grid cells -> anchor (4, 4) is the best match
    grid = np.where(pos)[0][0]
    assert grid % 3 == 1  # anchor index 1
    assert row[1] == 1.0  # class
    np.testing.assert_allclose(row[2:4], [0.0, 0.0], atol=1e-9)  # center cell
    np.testing.assert_allclose(row[4:6], np.log(5.0 / 4.0), rtol=1e-6)
    np.testing.assert_allclose(row[6], 2.0 - 0.25)  # 2 - area frac
    np.testing.assert_allclose(row[7:], [0.25, 0.25, 0.75, 0.75])
    # anchor (12, 12) has IoU 25/144 < 0.5 and isn't best: untouched;
    # but if multiple anchors were above ignore thresh they'd be -1.


def test_gt_creator_ignore_anchors():
    # two similar anchors: both above ignore thresh, one best, one ignored
    labels = [np.array([[0.25, 0.25, 0.75, 0.75, 0.0]])]
    anchors = ((5.0, 5.0), (5.5, 5.5), (0.1, 0.1))
    gt = gt_creator((160, 160), 16, labels, anchors)
    g = gt[0].reshape(10, 10, 3, 11)
    cell = g[5, 5]
    assert cell[0, 0] == 1.0  # (5,5) anchor: IoU=1, best
    assert cell[1, 0] == -1.0 and cell[1, 6] == -1.0  # ignored
    assert cell[2, 0] == 0.0  # below thresh: untouched


def test_gt_creator_skips_dirty_boxes():
    labels = [np.array([[0.5, 0.5, 0.5001, 0.6, 0.0]])]  # sub-pixel wide
    gt = gt_creator((160, 160), 16, labels, ((1.0, 1.0),))
    assert gt.sum() == 0.0


def test_multi_gt_creator_scale_routing():
    cfg = get_config("yolo_v3", "voc", input_size=(416, 416))
    # 333px box -> best anchor is (365.44, 358.72), the coarsest scale
    labels = [np.array([[0.1, 0.1, 0.9, 0.9, 2.0]])]
    gt = multi_gt_creator((416, 416), cfg.strides, labels, cfg.anchor_size)
    n_per_scale = [(416 // s) ** 2 * 3 for s in cfg.strides]
    assert gt.shape == (1, sum(n_per_scale), 11)
    pos_idx = np.where(gt[0, :, 0] == 1.0)[0]
    assert len(pos_idx) == 1
    assert pos_idx[0] >= n_per_scale[0] + n_per_scale[1]  # in stride-32 part


def test_build_targets_dispatch():
    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64))
    labels = [np.array([[0.2, 0.2, 0.6, 0.6, 1.0]])]
    gt = build_targets(cfg, labels)
    assert gt.shape[2] == 11
