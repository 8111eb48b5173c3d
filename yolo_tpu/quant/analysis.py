"""Quantization debugging/analysis tools.

The reference eyeballs quantization grids by printing unique weight
values (weightsdistribute, retune_bias_quantize.py:121-127). These
utilities quantify instead: per-layer weight/bias quantization SNR,
channel-range spread (per-tensor-scale damage indicator), and activation
scale summaries.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from yolo_tpu.quant import quantize as q


def _snr_db(clean: np.ndarray, quant: np.ndarray) -> float:
    err = clean - quant
    p_sig = float(np.mean(clean ** 2))
    p_err = float(np.mean(err ** 2)) + 1e-20
    return 10.0 * np.log10(p_sig / p_err + 1e-20)


def weight_report(params, bitwidth: int = 8,
                  prefix: str = "") -> List[dict]:
    """Per-conv quantization stats over an arbitrary param pytree.

    channel_spread = max over output channels of max|w_c| divided by the
    min over channels — large spread means per-tensor scales starve small
    channels (the reference quantizes per-tensor,
    retune_bias_quantize.py:73-86).
    """
    rows = []
    if isinstance(params, dict):
        if "w" in params:
            w = np.asarray(params["w"], np.float32)
            fq = np.asarray(q.fake_quantize(jnp.asarray(w), bitwidth))
            ch_max = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
            rows.append({
                "layer": prefix or "<conv>",
                "max_abs": float(np.abs(w).max()),
                "scale_exp": int(np.log2(float(
                    q.pow2_scale(jnp.asarray(w), bitwidth)))),
                "snr_db": _snr_db(w, fq),
                "channel_spread": float(
                    ch_max.max() / max(ch_max.min(), 1e-12)),
            })
            return rows
        for k, v in params.items():
            rows.extend(weight_report(v, bitwidth,
                                      f"{prefix}.{k}" if prefix else k))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            rows.extend(weight_report(v, bitwidth, f"{prefix}[{i}]"))
    return rows


def activation_report(tracker_states) -> List[dict]:
    """Summaries of calibrated activation trackers (dict or list form)."""
    items = (tracker_states.items() if isinstance(tracker_states, dict)
             else enumerate(tracker_states))
    rows = []
    for name, st in items:
        scale = float(np.asarray(st["scale"]))
        p2 = float(np.asarray(q.tracker_pow2(st))) if scale > 0 else 0.0
        rows.append({
            "tracker": str(name),
            "ema_scale": scale,
            "pow2_scale_exp": int(np.log2(p2)) if p2 > 0 else None,
            "implied_max": 127.0 / scale if scale > 0 else float("inf"),
        })
    return rows


def print_report(rows: List[dict], title: str = "") -> None:
    if title:
        print(f"=== {title} ===")
    if not rows:
        return
    keys = list(rows[0].keys())
    for r in rows:
        print("  ".join(f"{k}={r[k]:.3g}" if isinstance(r[k], float)
                        else f"{k}={r[k]}" for k in keys))
