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
