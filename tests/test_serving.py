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


def test_native_s2d_layout_matches_device_transform(rng):
    """native layout='s2d' output == s2d_input_np(nhwc int8 output):
    the host-side layout is bit-identical to the on-device transform."""
    native = pytest.importorskip("yolo_tpu.utils.native")
    if not native.available():
        pytest.skip("native library not built")
    from yolo_tpu.quant.fixed_point import s2d_input_np

    frames = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
              for _ in range(2)]
    nhwc = native.preprocess_batch(frames, (32, 32), int8_scale=16.0)
    s2d = native.preprocess_batch(frames, (32, 32), int8_scale=16.0,
                                  layout="s2d")
    np.testing.assert_array_equal(s2d, s2d_input_np(nhwc))


def test_int8_input_modes_bit_exact(rng):
    """detect(f32), detect(int8) and detect(int8 s2d) agree bit-exactly
    given the same quantized input (the host-quantize serving paths)."""
    import jax

    from yolo_tpu.models import slim_yolo_v2
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.int8_graph import (
        make_int8_detect_fn, quantize_pipeline)

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg,
                                      batch_norm=True)
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)]
    m = quantize_pipeline(params, cfg, batches)
    imgs = batches[0]
    x_q = np.asarray(fp.quantize_input(imgs, m.sa["in"]))

    det_f32 = make_int8_detect_fn(m, cfg)
    det_s2d = make_int8_detect_fn(m, cfg, input_s2d=True)
    want = [np.asarray(a) for a in det_f32(imgs)]
    got_i8 = [np.asarray(a) for a in det_f32(x_q)]
    got_s2d = [np.asarray(a) for a in det_s2d(fp.s2d_input_np(x_q))]
    # f32 path quantizes in-graph with the same rounding -> identical
    for w, a, b in zip(want, got_i8, got_s2d):
        np.testing.assert_array_equal(w, a)
        np.testing.assert_array_equal(w, b)
    # and the f32 path through an input_s2d graph (on-device transform)
    got_f32_s2d = [np.asarray(a) for a in det_s2d(imgs)]
    for w, a in zip(want, got_f32_s2d):
        np.testing.assert_array_equal(w, a)


def test_s2d_entry_slice_matches_odd_layout(rng):
    """The odd-aligned entry-pair layout is an exact block-slice of the
    serving s2d layout (one host layout feeds every family)."""
    import jax.numpy as jnp

    from yolo_tpu.quant import fixed_point as fp

    x = rng.integers(-128, 128, (2, 16, 20, 3)).astype(np.int8)
    served = fp.s2d_input_np(x)
    odd = np.asarray(fp._s2d_blocks(
        jnp.pad(jnp.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))))
    np.testing.assert_array_equal(
        np.asarray(fp.s2d_entry_from_input(served)), odd)


@pytest.mark.parametrize("version", ["tiny_yolo_v3", "yolo_v2", "yolo_v3"])
def test_int8_input_modes_bit_exact_families(rng, version):
    """Every family's integer engine accepts f32 / host-int8 / s2d-layout
    input with bit-identical outputs (tiny/v2: fused MXU conv1+pool;
    v3: the entry pair consumes the layout directly)."""
    import jax

    from yolo_tpu.detector import Detector
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.dispatch import (build_int8_detector,
                                         input_scale_exponent)

    cfg = get_config(version, "mask", input_size=(64, 64))
    params = Detector(cfg).init_params(jax.random.PRNGKey(0))
    batches = [rng.random((2, 64, 64, 3), dtype=np.float32)]
    m, det_f32 = build_int8_detector(version, params, cfg, batches)
    _, det_s2d = build_int8_detector(version, params, cfg, batches,
                                     input_s2d=True)
    imgs = batches[0]
    x_q = np.asarray(fp.quantize_input(imgs, input_scale_exponent(m)))

    want = [np.asarray(a) for a in det_f32(imgs)]
    got_i8 = [np.asarray(a) for a in det_f32(x_q)]
    got_s2d = [np.asarray(a) for a in det_s2d(fp.s2d_input_np(x_q))]
    got_f32_s2d = [np.asarray(a) for a in det_s2d(imgs)]
    for w, a, b, c in zip(want, got_i8, got_s2d, got_f32_s2d):
        np.testing.assert_array_equal(w, a)
        np.testing.assert_array_equal(w, b)
        np.testing.assert_array_equal(w, c)


def test_streaming_detector_s2d_preprocess(rng):
    """StreamingDetector(s2d=True) hands the detect fn the padded s2d
    int8 layout (numpy fallback path)."""
    from yolo_tpu.serving import StreamingDetector

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    seen = {}

    def fake_detect(batch):
        seen["shape"] = batch.shape
        seen["dtype"] = batch.dtype
        b = batch.shape[0]
        boxes = np.tile([0.25, 0.25, 0.75, 0.75], (b, 1, 1))
        return (boxes, np.full((b, 1), 0.9, np.float32),
                np.ones((b, 1), np.int32), np.ones((b, 1), bool))

    sd = StreamingDetector(cfg, fake_detect, batch_size=2,
                           use_native=False, sa_in=4, s2d=True)
    frames = [rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
              for _ in range(2)]
    sd.detect_frames(frames)
    assert seen["shape"] == (2, 19, 19, 12)
    assert seen["dtype"] == np.int8


def test_detect_stream_prefetch(rng):
    """detect_stream yields one result list per input batch with the
    prefetch thread in play."""
    from yolo_tpu.serving import StreamingDetector

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    calls = []

    def fake_detect(batch):
        calls.append(batch.shape[0])
        b = batch.shape[0]
        boxes = np.tile([0.25, 0.25, 0.75, 0.75], (b, 1, 1))
        return (boxes, np.full((b, 1), 0.9, np.float32),
                np.ones((b, 1), np.int32), np.ones((b, 1), bool))

    sd = StreamingDetector(cfg, fake_detect, batch_size=2,
                           use_native=False)
    batches = [[rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
                for _ in range(2)] for _ in range(3)]
    results = list(sd.detect_stream(batches))
    assert len(results) == 3
    assert all(len(r) == 2 for r in results)
    assert calls == [2, 2, 2]


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


def test_serving_input_validation(rng):
    """Mismatched input shapes raise a clear ValueError at first call
    (not a broadcast error deep in decode) — for both NHWC and the s2d
    serving layout, across the jitted family detect fns."""
    import jax

    from yolo_tpu.models import slim_yolo_v2
    from yolo_tpu.quant import fixed_point as fp
    from yolo_tpu.quant.int8_graph import (
        make_int8_detect_fn, quantize_pipeline)

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg,
                                      batch_norm=True)
    m = quantize_pipeline(params, cfg,
                          [rng.random((2, 32, 32, 3), dtype=np.float32)])

    detect = make_int8_detect_fn(m, cfg)
    with pytest.raises(ValueError, match="built for input_size 32x32"):
        detect(rng.random((2, 48, 48, 3), dtype=np.float32))
    with pytest.raises(ValueError, match="batched"):
        detect(rng.random((32, 32, 3), dtype=np.float32))

    det_s2d = make_int8_detect_fn(m, cfg, input_s2d=True)
    bad = rng.integers(-128, 128, (2, 32, 32, 3)).astype(np.int8)
    with pytest.raises(ValueError, match="space-to-depth"):
        det_s2d(bad)
    # the correct s2d layout passes
    good = fp.s2d_input_np(bad)
    det_s2d(good)


def test_float_detector_input_validation(rng):
    """The float Detector.predict/detect paths also validate input shape
    at trace time (previously a cryptic broadcast TypeError deep in
    decode)."""
    import jax

    from yolo_tpu.detector import build_detector

    det = build_detector("slim_yolo_v2", "mask", input_size=(32, 32))
    params = det.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="built for input_size 32x32"):
        det.detect(params, rng.random((2, 48, 48, 3), dtype=np.float32))
    with pytest.raises(ValueError, match="batched"):
        det.predict(params, rng.random((32, 32, 3), dtype=np.float32))
    det.detect(params, rng.random((2, 32, 32, 3), dtype=np.float32))
