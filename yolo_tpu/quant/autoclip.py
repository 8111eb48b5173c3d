"""Automatic head-clip selection for PTQ calibration.

The prediction head's activation range is dominated by a few extreme
conf logits; clipping the tracked range (head_clip) trades saturation of
those outliers (harmless after sigmoid) for a finer quantization grid on
everything else. PARITY.md shows the cap is worth tens of mAP points —
but the best value is model-dependent, and the reference hand-picks it
per run (the findbest search spirit,
reference retune_bias_quantize_findbest.py:115-148).

``select_head_clip`` sweeps candidate caps and scores each with a
detection-agreement proxy on the calibration batches: how well the INT8
engine's detections reproduce the FP32 model's detections (score-weighted
best-IoU matching). This is exactly the quantity mAP measures, without
needing labels.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

DEFAULT_CAPS: Tuple[Optional[float], ...] = (None, 8.0, 16.0, 32.0)


def detection_agreement(float_out, int_out) -> float:
    """Score in [0, 1]: confidence-weighted best-IoU agreement of the
    int8 detections with the float detections (same class required)."""
    fb, fs, fc, fv = (np.asarray(a) for a in float_out)
    ib, is_, ic, iv = (np.asarray(a) for a in int_out)
    total_w = 0.0
    total = 0.0
    for i in range(fb.shape[0]):
        fkeep = np.where(fv[i])[0]
        for k in fkeep:
            w = float(fs[i, k])
            total_w += w
            same = np.where(iv[i] & (ic[i] == fc[i, k]))[0]
            if same.size == 0:
                continue
            x1 = np.maximum(ib[i, same, 0], fb[i, k, 0])
            y1 = np.maximum(ib[i, same, 1], fb[i, k, 1])
            x2 = np.minimum(ib[i, same, 2], fb[i, k, 2])
            y2 = np.minimum(ib[i, same, 3], fb[i, k, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            area_f = ((fb[i, k, 2] - fb[i, k, 0]) *
                      (fb[i, k, 3] - fb[i, k, 1]))
            area_i = ((ib[i, same, 2] - ib[i, same, 0]) *
                      (ib[i, same, 3] - ib[i, same, 1]))
            iou = inter / np.maximum(area_f + area_i - inter, 1e-9)
            # penalize score disagreement of the best spatial match
            j = int(np.argmax(iou))
            total += w * float(iou[j]) * (
                1.0 - min(1.0, abs(float(is_[i, same[j]]) - w)))
    if total_w == 0.0:
        return 1.0  # no float detections: nothing to disagree about
    return total / total_w


def _as_f32_batches(batches):
    """float32-coerce host batches; device (jax.Array) batches pass
    through untouched — np.asarray would round-trip them through the
    host on every use (the search scores dozens of engines on the same
    calibration set)."""
    import jax

    return [b if isinstance(b, jax.Array) else np.asarray(b, np.float32)
            for b in batches]


def _float_reference(version: str, params_fp32, cfg, calib_batches):
    """FP32 detections on the calibration batches (the agreement target)."""
    from yolo_tpu.detector import Detector

    det = Detector(cfg, batch_norm=not version.endswith("_q_bf"))
    return [det.detect(params_fp32, b) for b in calib_batches]


def _agreement(detect, float_outs, calib_batches) -> float:
    return float(np.mean([
        detection_agreement(fo, detect(b))
        for fo, b in zip(float_outs, calib_batches)]))


def select_head_clip(version: str, params_fp32, cfg,
                     calib_batches: Iterable[np.ndarray],
                     caps: Sequence[Optional[float]] = DEFAULT_CAPS,
                     verbose: bool = False,
                     float_outs=None) -> Tuple[Optional[float], Dict]:
    """Sweep ``caps``, quantize with each, and return
    (best_cap, {cap: score}) by detection agreement with the FP32 model
    on the calibration batches."""
    from yolo_tpu.quant.dispatch import build_int8_detector

    calib_batches = _as_f32_batches(calib_batches)
    if float_outs is None:
        float_outs = _float_reference(version, params_fp32, cfg,
                                      calib_batches)

    scores: Dict = {}
    best_cap, best_score = None, -1.0
    for cap in caps:
        _, detect = build_int8_detector(version, params_fp32, cfg,
                                        calib_batches, head_clip=cap)
        s = _agreement(detect, float_outs, calib_batches)
        scores[cap] = s
        if verbose:
            print(f"head_clip={cap}: agreement {s:.4f}")
        if s > best_score:
            best_cap, best_score = cap, s
    return best_cap, scores


# ---------------------------------------------------------------------------
# Per-tracker clip search (VERDICT r4 next #4): the head cap only reaches
# the prediction-head trackers, but per-tensor abs-max grids in the
# BACKBONE are where e.g. tiny_yolo_v3's sim loss lives. Two per-tracker
# mechanisms, both scored by the same label-free detection agreement:
#
#   1. percentile calibration — every tracker clips to the q-th
#      percentile of |act| instead of the max (one swept hyperparameter,
#      per-tracker clip values);
#   2. greedy refinement — per tracker, try one extra bit of resolution
#      (double the tracked scale = halve the range) and keep it iff
#      agreement improves.
#
# The reference's tracker has no answer here (models/slim_yolo_v2.py:
# 25-31 is plain abs-max EMA); its findbest search only sweeps the
# retune shift table (retune_bias_quantize_findbest.py:115-148).
# ---------------------------------------------------------------------------

DEFAULT_PERCENTILES: Tuple[Optional[float], ...] = (
    None, 99.95, 99.8, 99.5, 99.0)


def calibrate_states(version: str, params_fp32, cfg, calib_batches,
                     head_clip: Optional[float] = None,
                     act_percentile: Optional[float] = None):
    """Family-aware calibration: returns the tracker states (slim = name
    dict, others = call-ordered list) that build_int8_detector(states=)
    consumes."""
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.bn_fold import fold_batch_norm

    fold = not version.endswith("_q_bf")
    fused = fold_batch_norm(params_fp32) if fold else params_fp32
    if version.startswith("slim_yolo_v2"):
        from yolo_tpu.quant import qsim
        params_q = qsim.fake_quantize_params(fused)
        return qsim.calibrate(params_q, cfg, calib_batches,
                              head_clip=head_clip,
                              act_percentile=act_percentile)
    from yolo_tpu.quant.generic import (
        calibrate_generic, fake_quantize_all_convs)
    det = Detector(cfg)
    params_q = fake_quantize_all_convs(fused)
    return calibrate_generic(det.module, params_q, cfg,
                             list(calib_batches), head_clip=head_clip,
                             act_percentile=act_percentile)


def _tracker_items(states):
    """Uniform (key, state) iteration, input tap excluded (image data
    has no outlier tail; clipping it only loses information)."""
    if isinstance(states, dict):
        return [(k, v) for k, v in states.items() if k != "in"]
    return list(enumerate(states))[1:]


def _with_scale(states, key, factor: float):
    """Copy of ``states`` with tracker ``key``'s raw EMA scale scaled by
    ``factor`` (2.0 = one bit finer grid, half the representable range)."""
    if isinstance(states, dict):
        out = dict(states)
        st = dict(out[key])
        st["scale"] = st["scale"] * factor
        out[key] = st
        return out
    out = list(states)
    st = dict(out[key])
    st["scale"] = st["scale"] * factor
    out[key] = st
    return out


def select_quant_config(version: str, params_fp32, cfg,
                        calib_batches: Iterable[np.ndarray],
                        caps: Sequence[Optional[float]] = DEFAULT_CAPS,
                        percentiles: Sequence[Optional[float]] =
                        DEFAULT_PERCENTILES,
                        greedy_rounds: int = 0,
                        min_gain: float = 1e-4,
                        verbose: bool = False) -> Tuple[dict, Dict]:
    """Full label-free PTQ configuration search.

    Stage 1 sweeps the head cap (select_head_clip); stage 2 sweeps the
    activation percentile at the best cap (per-tracker clips from one
    knob); stage 3 (``greedy_rounds`` > 0) refines tracker-by-tracker:
    each round tries one extra bit of resolution on every tracker and
    keeps the flips that improve detection agreement by > ``min_gain``.
    Each greedy candidate is a full engine rebuild, so a round costs
    ~n_trackers compiles — use on deployment-sized calibration only when
    the cheaper stages leave a gap.

    Returns (best, info): ``best`` has head_clip / act_percentile /
    states / score — pass ``states`` to build_int8_detector(states=...)
    (or any family pipeline's ``states=``) to serve this configuration.
    """
    from yolo_tpu.quant.dispatch import build_int8_detector

    calib_batches = _as_f32_batches(calib_batches)
    float_outs = _float_reference(version, params_fp32, cfg,
                                  calib_batches)

    cap, cap_scores = select_head_clip(version, params_fp32, cfg,
                                       calib_batches, caps, verbose,
                                       float_outs=float_outs)

    def score_states(states) -> float:
        _, detect = build_int8_detector(version, params_fp32, cfg,
                                        calib_batches, states=states)
        return _agreement(detect, float_outs, calib_batches)

    pct_scores: Dict = {}
    best_p, best_states, best_score = None, None, -1.0
    for p in percentiles:
        states = calibrate_states(version, params_fp32, cfg,
                                  calib_batches, head_clip=cap,
                                  act_percentile=p)
        s = score_states(states)
        pct_scores[p] = s
        if verbose:
            print(f"act_percentile={p}: agreement {s:.4f}")
        if s > best_score:
            best_p, best_states, best_score = p, states, s

    flips = []
    for r in range(greedy_rounds):
        improved = False
        for key, _ in _tracker_items(best_states):
            cand = _with_scale(best_states, key, 2.0)
            s = score_states(cand)
            if s > best_score + min_gain:
                if verbose:
                    print(f"greedy[{r}] tracker {key}: {best_score:.4f} "
                          f"-> {s:.4f} (kept)")
                best_states, best_score = cand, s
                flips.append((r, key, s))
                improved = True
        if not improved:
            break

    best = {"head_clip": cap, "act_percentile": best_p,
            "states": best_states, "score": best_score}
    info = {"cap_scores": cap_scores, "pct_scores": pct_scores,
            "greedy_flips": flips}
    return best, info
