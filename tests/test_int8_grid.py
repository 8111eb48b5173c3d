"""Family-wide weight-grid options for the true-integer engines:
sub-8-bit weight bitwidth and per-output-channel pow2 scales
(the TPU-serving opt-ins — fixed_point.quantize_model semantics —
extended beyond slim to the tiny/v2/v3 FPN engines)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.bn_fold import fold_batch_norm
from yolo_tpu.quant.generic import (
    calibrate_generic, fake_quantize_all_convs, quant_forward_generic)


def _setup(version, rng, size=64):
    cfg = get_config(version, "voc", input_size=(size, size),
                     top_k=10, pre_nms_top_k=64)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((2, size, size, 3), dtype=np.float32)]
    return cfg, det, params, batches


def test_int_conv_requant_per_channel_matches_scalar_on_uniform(rng):
    """With a CONSTANT per-channel exponent array the requant chain must
    be bit-identical to the scalar sw path (the per-channel plumbing is
    a strict generalization) — incl. the split-conv concat grouping."""
    x1 = jnp.asarray(rng.integers(-100, 100, (1, 8, 8, 16)), jnp.int8)
    x2 = jnp.asarray(rng.integers(-100, 100, (1, 8, 8, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, 24, 12)), jnp.int8)
    b = jnp.asarray(rng.integers(-50, 50, (12,)), jnp.int32)
    kw = dict(sb=7, sa_out=4, retune=11, padding=1, leaky=True)
    sw_arr = np.full((12,), 8, np.int32)
    ref = fp.int_conv_requant(jnp.concatenate([x1, x2], -1), w, b,
                              sa_in=4, sw=8, **kw)
    got = fp.int_conv_requant(jnp.concatenate([x1, x2], -1), w, b,
                              sa_in=4, sw=sw_arr, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    split = fp.int_conv_requant([(x1, 4), (x2, 4)], w, b, sa_in=None,
                                sw=sw_arr, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(split))


def test_int_conv_requant_mixed_per_channel_exponents(rng):
    """Genuinely mixed per-channel exponents: each output channel must
    match a scalar-sw run with that channel's exponent."""
    x = jnp.asarray(rng.integers(-100, 100, (1, 8, 8, 6)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, 6, 4)), jnp.int8)
    b = jnp.asarray(rng.integers(-50, 50, (4,)), jnp.int32)
    kw = dict(sb=7, sa_in=4, sa_out=4, retune=11, padding=1, leaky=0.1)
    sw_arr = np.asarray([7, 8, 9, 10], np.int32)
    got = np.asarray(fp.int_conv_requant(x, w, b, sw=sw_arr, **kw))
    for c, s in enumerate(sw_arr):
        ref = np.asarray(fp.int_conv_requant(x, w, b, sw=int(s), **kw))
        np.testing.assert_array_equal(got[..., c], ref[..., c])


@pytest.mark.parametrize("version,pipeline_kw", [
    ("tiny_yolo_v3", {}),
    ("yolo_v2", {}),
    ("yolo_v3", {}),
])
def test_family_per_channel_engine_close_to_matching_sim(version,
                                                         pipeline_kw, rng):
    """Per-channel w4 integer engines track the float fake-quant sim on
    the SAME (width, per-channel) grid and frozen states — the same
    closeness bar as the per-tensor engines' tests."""
    from yolo_tpu.quant.dispatch import build_int8_detector

    cfg, det, params, batches = _setup(version, rng)
    m, detect = build_int8_detector(version, params, cfg, batches,
                                    weight_bitwidth=4, per_channel=True,
                                    **pipeline_kw)
    # every conv's sw is a per-channel array and levels fit in 4 bits
    sw = m.sw.values() if isinstance(m.sw, dict) else m.sw
    assert all(np.ndim(s) == 1 for s in sw)
    wq = m.w_q.values() if isinstance(m.w_q, dict) else m.w_q
    assert max(int(np.abs(np.asarray(w)).max()) for w in wq) <= 7

    module = __import__("yolo_tpu.models", fromlist=[version])
    module = getattr(module, version)
    fused = fold_batch_norm(params)
    params_q = fake_quantize_all_convs(fused, weight_bitwidth=4,
                                       per_channel=True)
    states = calibrate_generic(module, params_q, cfg, batches)
    x = jnp.asarray(batches[0])
    fouts, _, _ = quant_forward_generic(module, params_q, x, cfg, states)

    from yolo_tpu.quant import int8_models, int8_yolo_v3
    if version == "tiny_yolo_v3":
        iouts = int8_models.int8_tiny_forward(
            m, fp.quantize_input(x, m.sa["in"]))
    elif version == "yolo_v2":
        iouts = int8_models.int8_yolo_v2_forward(
            m, fp.quantize_input(x, m.sa["in"]))
    else:
        iouts = int8_yolo_v3.int8_yolo_v3_forward(
            m, fp.quantize_input(x, m.sa_in), s2d=False)
    for f, i in zip(fouts, iouts):
        a, b = np.asarray(f).ravel(), np.asarray(i).ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.98
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.2

    # the jitted end-to-end detector runs on the per-channel model
    boxes, scores, cls, valid = jax.device_get(detect(x))
    assert boxes.shape[0] == 2 and np.isfinite(scores).all()


def test_per_channel_refuses_s2d_forms(rng):
    from yolo_tpu.quant.int8_models import (
        make_int8_tiny_detect_fn, quantize_pipeline_tiny)
    from yolo_tpu.quant.int8_yolo_v3 import (
        make_int8_yolo_v3_detect_fn, quantize_pipeline_yolo_v3)

    cfg, det, params, batches = _setup("tiny_yolo_v3", rng)
    m = quantize_pipeline_tiny(params, cfg, batches, per_channel=True)
    with pytest.raises(ValueError, match="plain conv path"):
        make_int8_tiny_detect_fn(m, cfg, input_s2d=True)

    cfg3, det3, params3, batches3 = _setup("yolo_v3", rng)
    m3 = quantize_pipeline_yolo_v3(params3, cfg3, batches3,
                                   per_channel=True)
    with pytest.raises(ValueError, match="plain conv path"):
        make_int8_yolo_v3_detect_fn(m3, cfg3, input_s2d=True)
    # default s2d="entry" silently downgrades to the plain path
    detect = make_int8_yolo_v3_detect_fn(m3, cfg3)
    out = jax.device_get(detect(jnp.asarray(batches3[0])))
    assert np.isfinite(out[1]).all()


def test_family_sub8_per_tensor_unchanged_engines(rng):
    """weight_bitwidth alone (per-tensor) keeps scalar sw tables — the
    embedded-contract form — with levels inside the narrower range."""
    from yolo_tpu.quant.int8_models import quantize_pipeline_tiny

    cfg, det, params, batches = _setup("tiny_yolo_v3", rng)
    m = quantize_pipeline_tiny(params, cfg, batches, weight_bitwidth=5)
    assert all(np.ndim(s) == 0 for s in m.sw.values())
    assert max(int(np.abs(np.asarray(w)).max())
               for w in m.w_q.values()) <= 15
