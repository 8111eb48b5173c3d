"""Streaming pipeline + native preprocessing tests."""

import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.data.transforms import BaseTransform


def test_native_preprocess_matches_reference_path(rng):
    native = pytest.importorskip("yolo_tpu.utils.native")
    if not native.available():
        pytest.skip("native library not built")
    frames = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
              for _ in range(3)]
    out = native.preprocess_batch(frames, (32, 32))
    ref = np.stack([BaseTransform((32, 32))(f)[0] for f in frames])
    # cv2 resizes in fixed point; the native path is exact float
    assert np.abs(out - ref).max() < 0.05
    # int8 path: within one quantization level of the reference path
    qi = native.preprocess_batch(frames, (32, 32), int8_scale=64.0)
    refq = np.clip(np.round(ref * 64.0), -128, 127)
    assert np.abs(qi.astype(np.int32) - refq).max() <= 1


def test_letterbox_roundtrip(rng):
    from yolo_tpu.data.transforms import letterbox, unletterbox_boxes

    img = rng.integers(0, 256, (100, 200, 3), dtype=np.uint8)
    canvas, scale, pads = letterbox(img, (64, 64))
    assert canvas.shape == (64, 64, 3)
    assert scale == 64 / 200
    # a box spanning the full original frame maps to the content region
    # and back
    px, py = pads
    content = np.array([[px / 64, py / 64, (px + 200 * scale) / 64,
                         (py + 100 * scale) / 64]])
    back = unletterbox_boxes(content.copy(), (64, 64), scale, pads)
    np.testing.assert_allclose(back, [[0, 0, 200, 100]], atol=1e-6)


def test_streaming_detector_letterbox(rng):
    from yolo_tpu.serving import StreamingDetector

    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64))

    def fake_detect(batch):
        b = batch.shape[0]
        boxes = np.tile([0.25, 0.25, 0.75, 0.75], (b, 1, 1))
        return (boxes, np.full((b, 1), 0.9, np.float32),
                np.ones((b, 1), np.int32), np.ones((b, 1), bool))

    sd = StreamingDetector(cfg, fake_detect, batch_size=2,
                           use_native=False, letterbox=True)
    frames = [rng.integers(0, 256, (50, 100, 3), dtype=np.uint8)
              for _ in range(2)]
    results = sd.detect_frames(frames)
    boxes, _, _ = results[0]
    # canvas box center maps back to frame center
    cx = (boxes[0, 0] + boxes[0, 2]) / 2
    cy = (boxes[0, 1] + boxes[0, 3]) / 2
    np.testing.assert_allclose([cx, cy], [50, 25], atol=1.0)


def test_streaming_detector_fixed_batch(rng):
    """Pipeline pads short batches and maps boxes back to frame pixels."""
    from yolo_tpu.serving import StreamingDetector

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    k = 10

    def fake_detect(batch):
        b = batch.shape[0]
        boxes = np.tile([0.25, 0.25, 0.75, 0.75], (b, k, 1))
        scores = np.full((b, k), 0.9, np.float32)
        classes = np.ones((b, k), np.int32)
        valid = np.zeros((b, k), bool)
        valid[:, 0] = True
        return boxes, scores, classes, valid

    sd = StreamingDetector(cfg, fake_detect, batch_size=4,
                           use_native=False)
    frames = [rng.integers(0, 256, (100, 200, 3), dtype=np.uint8)
              for _ in range(3)]
    results = sd.detect_frames(frames)
    assert len(results) == 3
    boxes, scores, classes = results[0]
    assert boxes.shape == (1, 4)
    np.testing.assert_allclose(boxes[0], [50, 25, 150, 75])  # px coords
