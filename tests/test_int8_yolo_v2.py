"""True-integer yolo_v2 engine tests (darknet19 + reorg passthrough)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.int8_models import (
    V2_CONV_ORDER, int8_yolo_v2_forward, make_int8_yolo_v2_detect_fn,
    quantize_pipeline_yolo_v2)


def test_v2_program_conv_count():
    """18 darknet19 convs + 2 convsets_1 + route + convsets_2 + pred."""
    assert len(V2_CONV_ORDER) == 23
    assert V2_CONV_ORDER[-1] == "pred"
    assert V2_CONV_ORDER[18] == "convsets_1.0"


def test_int8_yolo_v2_close_to_float_sim(rng):
    cfg = get_config("yolo_v2", "mask", input_size=(64, 64), top_k=10,
                     pre_nms_top_k=64)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((1, 64, 64, 3), dtype=np.float32)]
    m = quantize_pipeline_yolo_v2(params, cfg, batches)

    from yolo_tpu.models import yolo_v2
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.generic import (
        calibrate_generic, fake_quantize_all_convs, quant_forward_generic)

    fused = fold_batch_norm(params)
    params_q = fake_quantize_all_convs(fused)
    states = calibrate_generic(yolo_v2, params_q, cfg, batches)
    x = jnp.asarray(batches[0])
    fouts, _, _ = quant_forward_generic(yolo_v2, params_q, x, cfg, states)

    iouts = int8_yolo_v2_forward(m, fp.quantize_input(x, m.sa["in"]))
    for f, i in zip(fouts, iouts):
        a, b = np.asarray(f).ravel(), np.asarray(i).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.95


def test_int8_yolo_v2_detections_agree_with_fakequant(rng):
    """Detection-level agreement: same top box/class, close score."""
    from yolo_tpu.quant.generic import quantize_detector

    cfg = get_config("yolo_v2", "mask", input_size=(64, 64), top_k=10,
                     pre_nms_top_k=64, conf_thresh=0.0)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((2, 64, 64, 3), dtype=np.float32)]

    _, _, fq_detect = quantize_detector(det, params, batches)
    m = quantize_pipeline_yolo_v2(params, cfg, batches)
    int_detect = make_int8_yolo_v2_detect_fn(m, cfg)

    x = np.asarray(batches[0], np.float32)
    fb, fs, fc, fv = (np.asarray(a) for a in fq_detect(x))
    ib, is_, ic, iv = (np.asarray(a) for a in int_detect(x))
    for img in range(2):
        f0, i0 = np.argmax(fs[img]), np.argmax(is_[img])
        assert fc[img][f0] == ic[img][i0]
        assert abs(fs[img][f0] - is_[img][i0]) < 0.15
        bf, bi = fb[img][f0], ib[img][i0]
        ix1, iy1 = max(bf[0], bi[0]), max(bf[1], bi[1])
        ix2, iy2 = min(bf[2], bi[2]), min(bf[3], bi[3])
        inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
        area = ((bf[2] - bf[0]) * (bf[3] - bf[1]) +
                (bi[2] - bi[0]) * (bi[3] - bi[1]) - inter)
        assert inter / max(area, 1e-9) > 0.6, (bf, bi)


def test_int8_reorg_preserves_values(rng):
    """reorg on int8 is a pure shuffle: same multiset of values, exact
    channel order vs the float op."""
    from yolo_tpu.ops import blocks

    x8 = jnp.asarray(rng.integers(-128, 128, (1, 4, 4, 8)), jnp.int8)
    got = np.asarray(blocks.reorg(x8, 2))
    want = np.asarray(blocks.reorg(x8.astype(jnp.float32), 2))
    np.testing.assert_array_equal(got.astype(np.float32), want)
