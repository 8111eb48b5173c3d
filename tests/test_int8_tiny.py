"""True-integer tiny_yolo_v3 tests."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.generic import (
    calibrate_generic, fake_quantize_all_convs, quant_forward_generic)
from yolo_tpu.quant.bn_fold import fold_batch_norm
from yolo_tpu.quant.int8_models import (
    int8_tiny_forward, make_int8_tiny_detect_fn, quantize_pipeline_tiny)


def _setup(rng):
    cfg = get_config("tiny_yolo_v3", "voc", input_size=(64, 64),
                     top_k=10, pre_nms_top_k=64)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((2, 64, 64, 3), dtype=np.float32)]
    return cfg, det, params, batches


def test_int_conv_requant_split_matches_whole(rng):
    """split-conv over a concat == conv over the concatenated tensor when
    scales are equal."""
    x1 = jnp.asarray(rng.integers(-100, 100, (1, 8, 8, 16)), jnp.int8)
    x2 = jnp.asarray(rng.integers(-100, 100, (1, 8, 8, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, 24, 12)), jnp.int8)
    b = jnp.asarray(rng.integers(-50, 50, (12,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_out=4, retune=11, padding=1, leaky=True)
    whole = fp.int_conv_requant(jnp.concatenate([x1, x2], -1), w, b,
                                sa_in=4, **kw)
    split = fp.int_conv_requant([(x1, 4), (x2, 4)], w, b, sa_in=None, **kw)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(split))


def test_int8_tiny_close_to_float_sim(rng):
    cfg, det, params, batches = _setup(rng)
    m = quantize_pipeline_tiny(params, cfg, batches)

    # float fake-quant sim outputs
    from yolo_tpu.models import tiny_yolo_v3
    fused = fold_batch_norm(params)
    params_q = fake_quantize_all_convs(fused)
    states = calibrate_generic(tiny_yolo_v3, params_q, cfg, batches)
    x = jnp.asarray(batches[0])
    fouts, _, _ = quant_forward_generic(tiny_yolo_v3, params_q, x, cfg,
                                        states)

    x_q = fp.quantize_input(x, m.sa["in"])
    iouts = int8_tiny_forward(m, x_q)
    for f, i in zip(fouts, iouts):
        a, b = np.asarray(f).ravel(), np.asarray(i).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.98
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.2


def test_int8_tiny_no_accumulator_overflow(rng):
    """Retune shifts from the headroom search keep the int16 accumulator
    in range (value-level check via the retune bound itself)."""
    cfg, det, params, batches = _setup(rng)
    m = quantize_pipeline_tiny(params, cfg, batches)
    assert all(0 <= r <= 14 for r in m.retune.values())


def test_int8_tiny_detect_runs(rng):
    cfg, det, params, batches = _setup(rng)
    m = quantize_pipeline_tiny(params, cfg, batches)
    detect = make_int8_tiny_detect_fn(m, cfg)
    boxes, scores, cls, valid = jax.device_get(
        detect(jnp.asarray(batches[0])))
    assert boxes.shape == (2, 10, 4)
    assert np.isfinite(scores).all()
