"""mAP regression guard for the quantization chain (VERDICT r4 next #6).

Bit-exactness tests catch engine-vs-oracle drift, but a semantics bug
that is *consistently* wrong in both (the r4 ``_leaky_int_slope`` class:
engines running the 0.125 shift where the float model uses slope 0.1)
only shows up at the mAP level. This module trains small models on the
easy synthetic task (fixed seeds, cached checkpoint in /tmp keyed by a
version salt) and asserts the KNOWN stage-delta structure from
docs/PARITY.md:

  - BN fold is mAP-identical (exact algebra)
  - weights-only fake-quant stays within a small band of fp32
  - the UNCAPPED integer engine shows the head-range collapse
  - the head-capped integer engine recovers to near fp32
  - the integer engine stays within a band of its fake-quant sim on the
    SAME tracker states (the slope-bug detector: engine arithmetic
    diverging from the sim's float semantics)

A reintroduced engine-semantics bug fails here in minutes instead of
surfacing in the next multi-minute manual parity campaign.
"""

import os

import jax
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.data import BaseTransform, BatchLoader, SyntheticDetection
from yolo_tpu.detector import Detector
from yolo_tpu.eval.voc_eval import VOCEvaluator
from yolo_tpu.train.targets import build_targets
from yolo_tpu.train.trainer import TrainConfig, lr_at, make_train_step

# bump when training hyperparameters or model init change
_SALT = "guard-v2"
SIZE = 64
VAL_IMAGES = 32


def _train_or_load(version: str, epochs: int):
    from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = get_config(version, "mask", input_size=(SIZE, SIZE),
                     conf_thresh=0.01)
    det = Detector(cfg)
    ckpt = f"/tmp/yolo_tpu_guard_{_SALT}_{version}.msgpack"
    if os.path.exists(ckpt):
        try:
            params, _ = load_checkpoint(ckpt)
            return cfg, det, params
        except Exception:
            pass
    params = det.init_params(jax.random.PRNGKey(0))
    ds = SyntheticDetection((SIZE, SIZE), num_classes=2, length=64,
                            transform=BaseTransform((SIZE, SIZE)))
    loader = BatchLoader(ds, 16, num_workers=0)
    tc = TrainConfig(base_lr=1e-3, wp_epoch=2, cos=True, max_epoch=epochs)
    opt, step = make_train_step(det.module, cfg, tc, donate=False)
    ost = opt.init(params)
    for epoch in range(epochs):
        for it, (images, targets) in enumerate(loader):
            lr = lr_at(tc, epoch, it, len(loader))
            gt = build_targets(cfg, targets)
            params, ost, _ = step(params, ost, images, gt, lr)
    save_checkpoint(ckpt, params)
    return cfg, det, params


def _evaluator(cfg):
    val = SyntheticDetection((SIZE, SIZE), num_classes=2,
                             length=VAL_IMAGES,
                             transform=BaseTransform((SIZE, SIZE)),
                             seed=99)
    return VOCEvaluator(val, 2, (SIZE, SIZE), batch_size=VAL_IMAGES)


def _calib(n=2):
    ds = SyntheticDetection((SIZE, SIZE), num_classes=2, length=16 * n,
                            transform=BaseTransform((SIZE, SIZE)))
    return [imgs for imgs, _ in
            list(BatchLoader(ds, 16, shuffle=False, num_workers=0))][:n]


@pytest.fixture(scope="module")
def slim_trained():
    return _train_or_load("slim_yolo_v2", epochs=150)


@pytest.fixture(scope="module")
def tiny_trained():
    return _train_or_load("tiny_yolo_v3", epochs=60)


def test_slim_stage_delta_structure(slim_trained):
    from yolo_tpu import detector as D
    from yolo_tpu.ops import nms as _nms
    from yolo_tpu.quant import qsim
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.int8_graph import (
        make_int8_detect_fn, quantize_pipeline)

    cfg, det, params = slim_trained
    ev = _evaluator(cfg)
    calib = _calib()

    m_fp32 = ev.evaluate(lambda im: det.detect(params, im))
    print(f"[guard] slim fp32 mAP {m_fp32:.4f}")
    assert m_fp32 > 0.30, f"guard model undertrained (fp32 mAP {m_fp32})"

    # BN fold: exact algebra, mAP-identical (PARITY.md row 1)
    fused = fold_batch_norm(params)
    det_f = Detector(cfg, batch_norm=False)
    m_fused = ev.evaluate(lambda im: det_f.detect(fused, im))
    assert abs(m_fused - m_fp32) < 1e-9

    # weights-only fake-quant: small damage
    params_q = qsim.fake_quantize_params(fused)
    m_wq = ev.evaluate(lambda im: det_f.detect(params_q, im))
    assert abs(m_wq - m_fp32) < 0.06

    # uncapped integer engine: the head-range collapse must be PRESENT
    # (if it vanishes, the tracker/cap semantics changed — investigate)
    m_unc = quantize_pipeline(params, cfg, calib)
    d_unc = make_int8_detect_fn(m_unc, cfg)
    m_int = ev.evaluate(lambda im: d_unc(np.asarray(im, np.float32)))

    # head-capped integer engine: recovers to near fp32
    m_hc = quantize_pipeline(params, cfg, calib, head_clip=16.0)
    d_hc = make_int8_detect_fn(m_hc, cfg)
    m_int_hc = ev.evaluate(lambda im: d_hc(np.asarray(im, np.float32)))
    print(f"[guard] slim wq {m_wq:.4f} uncapped {m_int:.4f} "
          f"capped {m_int_hc:.4f}")
    assert m_int_hc > m_fp32 - 0.12, (
        f"capped integer engine regressed: {m_int_hc} vs fp32 {m_fp32}")
    assert m_int_hc - m_int > 0.05, (
        f"head-clip recovery structure missing: uncapped {m_int} vs "
        f"capped {m_int_hc} — cap/tracker semantics changed")

    # integer engine vs fake-quant sim on the SAME states: the engine's
    # arithmetic must reproduce the sim's float semantics at mAP level
    states = qsim.calibrate(params_q, cfg, calib, head_clip=16.0)
    qmod = qsim.make_quant_module(params_q, states)

    @jax.jit
    def fq_detect(images):
        boxes, probs = D.predict(qmod, params_q, images, cfg)
        return _nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    m_sim = ev.evaluate(
        lambda im: fq_detect(np.asarray(im, np.float32)))
    print(f"[guard] slim sim {m_sim:.4f}")
    assert abs(m_int_hc - m_sim) < 0.06, (
        f"integer engine diverged from its fake-quant sim: engine "
        f"{m_int_hc} vs sim {m_sim} (the _leaky_int_slope bug class)")


def test_tiny_engine_matches_sim_at_map_level(tiny_trained):
    """tiny_yolo_v3 runs darknet slope 0.1 in the backbone — exactly
    where the r4 slope bug lived (engines shifting by 0.125). The
    integer engine must track its fake-quant sim at mAP level."""
    from yolo_tpu.quant.autoclip import calibrate_states
    from yolo_tpu.quant.dispatch import build_int8_detector
    from yolo_tpu.quant.generic import quantize_detector

    cfg, det, params = tiny_trained
    ev = _evaluator(cfg)
    calib = _calib()

    m_fp32 = ev.evaluate(lambda im: det.detect(params, im))
    print(f"[guard] tiny fp32 mAP {m_fp32:.4f}")
    assert m_fp32 > 0.30, f"guard model undertrained (fp32 mAP {m_fp32})"

    states = calibrate_states("tiny_yolo_v3", params, cfg, calib,
                              head_clip=16.0)
    _, _, sim_detect = quantize_detector(det, params, calib,
                                         states=states)
    m_sim = ev.evaluate(
        lambda im: sim_detect(np.asarray(im, np.float32)))

    _, int_detect = build_int8_detector("tiny_yolo_v3", params, cfg,
                                        calib, states=states)
    m_int = ev.evaluate(
        lambda im: int_detect(np.asarray(im, np.float32)))
    print(f"[guard] tiny sim {m_sim:.4f} int {m_int:.4f}")
    assert abs(m_int - m_sim) < 0.08, (
        f"tiny integer engine diverged from its sim: engine {m_int} vs "
        f"sim {m_sim} (slope-class regression)")
    assert m_int > m_fp32 - 0.15, (
        f"tiny integer engine too far below fp32: {m_int} vs {m_fp32}")
