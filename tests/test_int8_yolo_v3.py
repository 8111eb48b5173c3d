"""True-integer yolo_v3 / yolo_v3_spp tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.int8_yolo_v3 import (
    _program, int8_yolo_v3_forward, make_int8_yolo_v3_detect_fn,
    quantize_pipeline_yolo_v3)


def test_int_add_requant_exact_alignment(rng):
    a = jnp.asarray(rng.integers(-100, 100, (2, 4, 4, 8)), jnp.int8)
    b = jnp.asarray(rng.integers(-100, 100, (2, 4, 4, 8)), jnp.int8)
    # scales 2^4 and 2^6; sum requantized to 2^4
    out = np.asarray(fp.int_add_requant(a, 4, b, 6, 4))
    want = np.asarray(a, np.int32) * 4 + np.asarray(b, np.int32)
    want = np.clip(np.sign(want) * ((np.abs(want) + 2) >> 2), -128, 127)
    np.testing.assert_array_equal(out, want)


def test_program_tap_and_conv_counts():
    """Program structure must match the float forward's call order:
    75 backbone taps (52 convs + 23 residual sums) + 23 head convs."""
    ops = _program(spp=False)
    convs = [o for o in ops if o[0] == "conv"]
    res = [o for o in ops if o[0] == "res"]
    assert len(convs) == 52 + 23
    assert len(res) == 23
    ops_spp = _program(spp=True)
    assert len([o for o in ops_spp if o[0] == "spp"]) == 1


def test_s2d_forward_bit_exact_with_plain(rng):
    """The s2d backbone path (fused entry pair + stride-2 block convs)
    must be BIT-IDENTICAL with the plain integer walk on the full v3
    program."""
    from yolo_tpu.models import yolo_v3

    cfg = get_config("yolo_v3", "voc", input_size=(64, 64))
    params = yolo_v3.init_params(jax.random.PRNGKey(0), cfg,
                                 batch_norm=True)
    calib = [rng.random((2, 64, 64, 3), dtype=np.float32)]
    m = quantize_pipeline_yolo_v3(params, cfg, calib)
    x_q = fp.quantize_input(jnp.asarray(calib[0]), m.sa_in)
    want = int8_yolo_v3_forward(m, x_q, s2d=False)
    got = int8_yolo_v3_forward(m, x_q, s2d=True)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("spp", [
    False,
    pytest.param(True, marks=pytest.mark.skipif(
        not os.environ.get("YOLO_TPU_SLOW_TESTS"),
        reason="spp variant shares the code path; set "
               "YOLO_TPU_SLOW_TESTS=1 to run (75-conv CPU compile)")),
])
def test_int8_yolo_v3_close_to_float_sim(rng, spp):
    name = "yolo_v3_spp" if spp else "yolo_v3"
    cfg = get_config(name, "voc", input_size=(64, 64), top_k=10,
                     pre_nms_top_k=64)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((1, 64, 64, 3), dtype=np.float32)]
    m = quantize_pipeline_yolo_v3(params, cfg, batches, spp=spp)

    # integer forward runs and stays correlated with the fake-quant sim
    from yolo_tpu.models import yolo_v3, yolo_v3_spp
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.generic import (
        calibrate_generic, fake_quantize_all_convs, quant_forward_generic)

    module = yolo_v3_spp if spp else yolo_v3
    fused = fold_batch_norm(params)
    params_q = fake_quantize_all_convs(fused)
    states = calibrate_generic(module, params_q, cfg, batches)
    x = jnp.asarray(batches[0])
    fouts, _, _ = quant_forward_generic(module, params_q, x, cfg, states)

    iouts = int8_yolo_v3_forward(m, fp.quantize_input(x, m.sa_in))
    for f, i in zip(fouts, iouts):
        a, b = np.asarray(f).ravel(), np.asarray(i).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.95


def test_int8_tiny_detections_agree_with_fakequant(rng):
    """Stronger than corrcoef (VERDICT r1 item #6, unit-level half):
    the integer engine's DECODED DETECTIONS must agree with the
    fake-quant float sim — same top box to within a couple of int8
    quantization steps. A systematically biased layer passes corrcoef
    but shifts boxes; this catches it. (The mAP-delta half lives in
    scripts/quant_parity_v3.py + docs/PARITY.md.)"""
    from yolo_tpu.quant.generic import quantize_detector
    from yolo_tpu.quant.int8_models import (
        make_int8_tiny_detect_fn, quantize_pipeline_tiny)

    cfg = get_config("tiny_yolo_v3", "mask", input_size=(64, 64),
                     top_k=10, pre_nms_top_k=64, conf_thresh=0.0)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((2, 64, 64, 3), dtype=np.float32)]

    _, _, fq_detect = quantize_detector(det, params, batches)
    m = quantize_pipeline_tiny(params, cfg, batches)
    int_detect = make_int8_tiny_detect_fn(m, cfg)

    x = np.asarray(batches[0], np.float32)
    fb, fs, fc, fv = (np.asarray(a) for a in fq_detect(x))
    ib, is_, ic, iv = (np.asarray(a) for a in int_detect(x))
    for img in range(2):
        # top-scoring box of each pipeline: same class, overlapping box,
        # close score
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


@pytest.mark.skipif(not os.environ.get("YOLO_TPU_SLOW_TESTS"),
                    reason="extra 75-conv jit; set YOLO_TPU_SLOW_TESTS=1")
def test_int8_yolo_v3_detect_fn(rng):
    cfg = get_config("yolo_v3", "voc", input_size=(64, 64), top_k=10,
                     pre_nms_top_k=64)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((1, 64, 64, 3), dtype=np.float32)]
    m = quantize_pipeline_yolo_v3(params, cfg, batches)
    detect = make_int8_yolo_v3_detect_fn(m, cfg)
    boxes, scores, cls, valid = jax.device_get(
        detect(jnp.asarray(batches[0])))
    assert boxes.shape == (1, 10, 4)
    assert np.isfinite(scores).all()
