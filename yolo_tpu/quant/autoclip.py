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


def select_head_clip(version: str, params_fp32, cfg,
                     calib_batches: Iterable[np.ndarray],
                     caps: Sequence[Optional[float]] = DEFAULT_CAPS,
                     verbose: bool = False
                     ) -> Tuple[Optional[float], Dict]:
    """Sweep ``caps``, quantize with each, and return
    (best_cap, {cap: score}) by detection agreement with the FP32 model
    on the calibration batches."""
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.dispatch import build_int8_detector

    calib_batches = [np.asarray(b, np.float32) for b in calib_batches]
    det = Detector(cfg, batch_norm=not version.endswith("_q_bf"))
    float_outs = [det.detect(params_fp32, b) for b in calib_batches]

    scores: Dict = {}
    best_cap, best_score = None, -1.0
    for cap in caps:
        _, detect = build_int8_detector(version, params_fp32, cfg,
                                        calib_batches, head_clip=cap)
        s = float(np.mean([
            detection_agreement(fo, detect(b))
            for fo, b in zip(float_outs, calib_batches)]))
        scores[cap] = s
        if verbose:
            print(f"head_clip={cap}: agreement {s:.4f}")
        if s > best_score:
            best_cap, best_score = cap, s
    return best_cap, scores
