"""Generic (model-agnostic) PTQ tests across architectures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.quant import generic
from yolo_tpu.quant import qsim
from yolo_tpu.quant.bn_fold import fold_batch_norm


def test_generic_matches_slim_qsim(rng):
    """On slim_yolo_v2 the generic context must reproduce the dedicated
    qsim implementation exactly (same tap order: input, conv1..7, pred)."""
    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    fused = fold_batch_norm(params)
    params_q = qsim.fake_quantize_params(fused)
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)
               for _ in range(2)]

    # calibrate both paths
    slim_states = qsim.calibrate(params_q, cfg, batches)
    gen_states = generic.calibrate_generic(det.module, params_q, cfg,
                                           batches)
    assert len(gen_states) == len(qsim.TRACKER_NAMES)
    for i, name in enumerate(qsim.TRACKER_NAMES):
        np.testing.assert_allclose(
            float(gen_states[i]["scale"]),
            float(slim_states[name]["scale"]), rtol=1e-6)

    # quantized forward parity
    x = jnp.asarray(batches[0])
    want, _, _ = qsim.quant_forward(params_q, x, cfg, slim_states,
                                    quantization=True)
    got, _, _ = generic.quant_forward_generic(det.module, params_q, x, cfg,
                                           gen_states)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-5, atol=1e-5)


def test_fake_quantize_all_convs_generic_tree(rng):
    cfg = get_config("tiny_yolo_v3", "voc", input_size=(64, 64))
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    fused = fold_batch_norm(params)
    pq = generic.fake_quantize_all_convs(fused)
    # every weight lands on a pow2 grid
    w = np.asarray(pq["pred_1"]["w"])
    nz = w[w != 0]
    scale = 2.0 ** np.floor(np.log2(127 / np.abs(
        np.asarray(fused["pred_1"]["w"])).max()))
    np.testing.assert_allclose(nz * scale, np.round(nz * scale),
                               atol=1e-4)


@pytest.mark.parametrize("model", ["tiny_yolo_v3"])
def test_generic_quantize_detector_runs(rng, model):
    cfg = get_config(model, "voc", input_size=(64, 64), top_k=10,
                     pre_nms_top_k=64)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    batches = [rng.random((2, 64, 64, 3), dtype=np.float32)]
    params_q, states, detect_fn = generic.quantize_detector(
        det, params, batches)
    boxes, scores, classes, valid = jax.device_get(
        detect_fn(jnp.asarray(batches[0])))
    assert boxes.shape == (2, 10, 4)
    assert np.isfinite(scores).all()
    # quantized output stays close to the float model's output
    fused = fold_batch_norm(params)
    fb, fprobs = jax.device_get(det.predict(fused, batches[0]))
    qouts, _, _ = generic.quant_forward_generic(
        det.module, params_q, jnp.asarray(batches[0]), cfg, states)
    fouts = det.module.forward(fused, jnp.asarray(batches[0]), cfg)
    a = np.asarray(fouts[0]).ravel()
    b = np.asarray(qouts[0]).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_autoclip_selects_reasonable_cap(rng):
    """head_clip='auto' sweeps caps, scores detection agreement against
    the FP32 model, and returns a member of the candidate set whose
    score is maximal (quant/autoclip.py)."""
    import jax

    from yolo_tpu.config import get_config
    from yolo_tpu.models import slim_yolo_v2
    from yolo_tpu.quant.autoclip import DEFAULT_CAPS, select_head_clip

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg,
                                      batch_norm=True)
    calib = [rng.random((2, 32, 32, 3), dtype=np.float32)]
    cap, scores = select_head_clip("slim_yolo_v2", params, cfg, calib)
    assert cap in DEFAULT_CAPS
    assert set(scores) == set(DEFAULT_CAPS)
    assert all(0.0 <= s <= 1.0 for s in scores.values())
    assert scores[cap] == max(scores.values())


def test_autoclip_agreement_metric():
    """Perfect agreement scores 1; a class-mismatched detection scores
    its IoU term as 0."""
    import numpy as np

    from yolo_tpu.quant.autoclip import detection_agreement

    boxes = np.array([[[0.1, 0.1, 0.5, 0.5]]], np.float32)
    scores = np.array([[0.9]], np.float32)
    classes = np.array([[1]], np.int32)
    valid = np.array([[True]])
    perfect = detection_agreement((boxes, scores, classes, valid),
                                  (boxes, scores, classes, valid))
    assert perfect == 1.0
    wrong_cls = detection_agreement(
        (boxes, scores, classes, valid),
        (boxes, scores, classes + 1, valid))
    assert wrong_cls == 0.0


def test_select_quant_config_per_tracker(rng):
    """The full per-tracker search (VERDICT r4 next #4): cap sweep ->
    percentile sweep -> one greedy refinement round. Returns states that
    build a working engine, and its score is >= the plain head-cap-only
    configuration's (the search space contains it)."""
    import jax

    from yolo_tpu.config import get_config
    from yolo_tpu.models import slim_yolo_v2
    from yolo_tpu.quant.autoclip import select_quant_config
    from yolo_tpu.quant.dispatch import build_int8_detector

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg,
                                      batch_norm=True)
    calib = [rng.random((2, 32, 32, 3), dtype=np.float32)]
    best, info = select_quant_config(
        "slim_yolo_v2", params, cfg, calib,
        caps=(None, 16.0), percentiles=(None, 99.0), greedy_rounds=1)
    assert best["head_clip"] in (None, 16.0)
    assert best["act_percentile"] in (None, 99.0)
    assert best["score"] >= max(info["cap_scores"].values()) - 1e-9
    assert best["score"] >= max(info["pct_scores"].values()) - 1e-9
    # the returned states serve a real engine
    _, detect = build_int8_detector("slim_yolo_v2", params, cfg, calib,
                                    states=best["states"])
    out = detect(np.asarray(calib[0], np.float32))
    assert np.asarray(out[0]).shape == (2, cfg.top_k, 4)


def test_select_quant_config_generic_family(rng):
    """calibrate_states + states= round-trips through a generic-family
    pipeline (tiny_yolo_v3 uses the call-ordered state list)."""
    import jax

    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.autoclip import calibrate_states
    from yolo_tpu.quant.dispatch import build_int8_detector

    cfg = get_config("tiny_yolo_v3", "mask", input_size=(64, 64))
    params = Detector(cfg).init_params(jax.random.PRNGKey(0))
    calib = [rng.random((2, 64, 64, 3), dtype=np.float32)]
    states = calibrate_states("tiny_yolo_v3", params, cfg, calib,
                              head_clip=16.0, act_percentile=99.5)
    assert isinstance(states, list) and len(states) > 1
    _, detect = build_int8_detector("tiny_yolo_v3", params, cfg, calib,
                                    states=states)
    out = detect(np.asarray(calib[0], np.float32))
    assert np.asarray(out[0]).shape == (2, cfg.top_k, 4)
