"""Decode + NMS parity: in-graph vs reference-semantics numpy oracle."""

import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.ops import decode, nms


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_make_grid_ordering():
    grid_xy, anchor_wh = decode.make_grid((32, 64), 16, [(1.0, 2.0)])
    g = np.asarray(grid_xy).reshape(2, 4, 2)  # hs=2, ws=4
    # row-major over (y, x); last dim is (x, y)
    np.testing.assert_allclose(g[0, :, 0], [0, 1, 2, 3])
    np.testing.assert_allclose(g[0, :, 1], [0, 0, 0, 0])
    np.testing.assert_allclose(g[1, :, 1], [1, 1, 1, 1])
    np.testing.assert_allclose(np.asarray(anchor_wh).ravel(), [1.0, 2.0])


def test_decode_boxes_matches_numpy_oracle(rng):
    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 96))
    stride = 16
    hs, ws, a = 4, 6, cfg.num_anchors
    txt = rng.standard_normal((2, hs * ws, a, 4)).astype(np.float32)
    grid_xy, anchor_wh = decode.make_grid((64, 96), stride, cfg.anchor_size)
    got = np.asarray(decode.decode_boxes(jnp.asarray(txt), grid_xy,
                                         anchor_wh, stride, "grid"))

    # oracle: reference decode math (models/slim_yolo_v2.py:111-143)
    gx = np.asarray(grid_xy)  # [1, HW, 1, 2]
    aw = np.asarray(anchor_wh)  # [1, 1, A, 2]
    xy = (_sigmoid(txt[..., :2]) + gx) * stride
    wh = np.exp(txt[..., 2:]) * aw * stride
    x1y1 = xy - wh / 2
    x2y2 = xy + wh / 2
    want = np.concatenate([x1y1, x2y2], -1).reshape(2, hs * ws * a, 4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_decode_pixel_anchor_units(rng):
    """v3-family: anchors in pixels, wh not multiplied by stride
    (reference models/yolo_v3.py:97-112)."""
    txt = np.zeros((1, 4, 1, 4), np.float32)
    grid_xy, anchor_wh = decode.make_grid((64, 64), 32, [(100.0, 50.0)])
    out = np.asarray(decode.decode_xywh(jnp.asarray(txt), grid_xy, anchor_wh,
                                        32, "pixel"))
    np.testing.assert_allclose(out[0, :, 2], 100.0)  # w = anchor_w * e^0
    np.testing.assert_allclose(out[0, :, 3], 50.0)


def _random_detections(rng, n, c):
    cxcy = rng.random((n, 2)) * 0.8 + 0.1
    wh = rng.random((n, 2)) * 0.3 + 0.02
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], 1)
    probs = rng.random((n, c)).astype(np.float32) ** 3  # mostly low scores
    return boxes.astype(np.float32), probs


def test_ingraph_postprocess_matches_numpy_oracle(rng):
    n, c = 200, 4
    boxes, probs = _random_detections(rng, n, c)
    conf_thresh, nms_thresh = 0.3, 0.5

    want_boxes, want_scores, want_cls = nms.postprocess_numpy(
        boxes, probs, c, conf_thresh, nms_thresh)

    got_b, got_s, got_c, got_v = nms.postprocess_jax(
        jnp.asarray(boxes), jnp.asarray(probs), conf_thresh, nms_thresh,
        pre_nms_top_k=n, top_k=n)
    got_b = np.asarray(got_b)[np.asarray(got_v)]
    got_s = np.asarray(got_s)[np.asarray(got_v)]
    got_c = np.asarray(got_c)[np.asarray(got_v)]

    assert len(got_s) == len(want_scores)
    # oracle output is in box-index order; in-graph is score-sorted
    order = np.argsort(-want_scores, kind="stable")
    np.testing.assert_allclose(got_s, want_scores[order], rtol=1e-6)
    np.testing.assert_allclose(got_b, want_boxes[order], rtol=1e-6)
    np.testing.assert_array_equal(got_c, want_cls[order])


def test_fast_nms_subset_of_greedy(rng):
    """fast NMS can only suppress a superset of what greedy suppresses."""
    boxes, probs = _random_detections(rng, 128, 3)
    kw = dict(conf_thresh=0.3, nms_thresh=0.5, pre_nms_top_k=128,
              top_k=128)
    _, gs, _, gv = nms.postprocess_jax(
        jnp.asarray(boxes), jnp.asarray(probs), mode="greedy", **kw)
    _, fs, _, fv = nms.postprocess_jax(
        jnp.asarray(boxes), jnp.asarray(probs), mode="fast", **kw)
    greedy_scores = set(np.asarray(gs)[np.asarray(gv)].tolist())
    fast_scores = set(np.asarray(fs)[np.asarray(fv)].tolist())
    assert fast_scores <= greedy_scores
    assert len(fast_scores) > 0


def test_batched_postprocess_shapes(rng):
    boxes = np.stack([_random_detections(rng, 64, 3)[0] for _ in range(4)])
    probs = np.stack([_random_detections(rng, 64, 3)[1] for _ in range(4)])
    b, s, c, v = nms.batched_postprocess(
        jnp.asarray(boxes), jnp.asarray(probs), 0.3, 0.5, 64, 10)
    assert b.shape == (4, 10, 4)
    assert s.shape == c.shape == v.shape == (4, 10)


def test_fixpoint_greedy_nms_matches_oracle_dense():
    """The Jacobi-fixpoint greedy NMS equals the sequential numpy oracle
    on dense random overlap patterns (20 trials, exact match)."""
    import jax.numpy as jnp

    from yolo_tpu.ops import nms

    rng = np.random.default_rng(0)
    for trial in range(20):
        n, c = 250, 3
        centers = rng.random((n, 2)) * 0.5
        wh = rng.random((n, 2)) * 0.4 + 0.05
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2],
                               axis=1).astype(np.float32)
        probs = rng.random((n, c)).astype(np.float32) ** 2
        _, s_j, c_j, v_j = (np.asarray(a) for a in nms.postprocess_jax(
            jnp.asarray(boxes), jnp.asarray(probs), 0.05, 0.45,
            pre_nms_top_k=256, top_k=256))
        _, ns, nc = nms.postprocess_numpy(boxes, probs, c, 0.05, 0.45)
        got = sorted(zip(s_j[v_j].round(5), c_j[v_j]))
        want = sorted(zip(ns.round(5), nc))
        assert got == want, trial
