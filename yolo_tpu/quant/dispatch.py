"""Per-family INT8 pipeline dispatch.

The reference hard-wires its quantization scripts to SlimYOLOv2
(retune_bias_quantize.py only imports that model class); here every model
family has its own true-integer engine, and this module is the single
place that maps a ``-v`` version string onto the matching
(quantize pipeline, detect-fn maker) pair so the CLIs (eval/test/serve)
and benches never need per-model branching.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple

from yolo_tpu.config import DetectorConfig

#: version -> family key
_FAMILY = {
    "slim_yolo_v2": "slim",
    "slim_yolo_v2_q_bf": "slim",
    "tiny_yolo_v3": "tiny",
    "yolo_v2": "v2",
    "yolo_v3": "v3",
    "yolo_v3_spp": "v3_spp",
}

INT8_VERSIONS = tuple(_FAMILY)


def build_int8_detector(version: str, params_fp32, cfg: DetectorConfig,
                        calib_batches: Iterable, *,
                        head_clip=None,
                        max_images: int = 1000,
                        rounding: str = "nearest",
                        states=None,
                        act_percentile: float = None,
                        weight_bitwidth: int = None,
                        per_channel: bool = False,
                        **maker_kwargs) -> Tuple[object, Callable]:
    """Quantize ``params_fp32`` with the family's PTQ pipeline and return
    ``(int8_model, detect_fn)``; ``detect_fn(images_f32) -> (boxes,
    scores, classes, valid)`` is jitted end-to-end.

    ``head_clip``: a float cap, None, or "auto" (sweep candidate caps
    and pick by detection agreement with the FP32 model — see
    quant.autoclip; the reference's findbest search spirit,
    retune_bias_quantize_findbest.py:115-148).

    ``states``: pre-computed tracker states (family format: slim = name
    dict, others = call-ordered list) — skips calibration and serves on
    those frozen scales (the QAT path and autoclip's per-tracker search
    both use this).

    ``act_percentile``: per-tracker outlier clip during calibration —
    track the q-th percentile of |act| instead of the abs-max.

    ``maker_kwargs`` (e.g. ``mesh=``, ``backend=``) pass through to the
    family's detect-fn maker when it supports them.
    """
    try:
        family = _FAMILY[version]
    except KeyError:
        raise ValueError(
            f"no INT8 engine for version {version!r}; "
            f"choose from {sorted(_FAMILY)}") from None

    calib_batches = list(calib_batches)
    if head_clip == "auto":
        from yolo_tpu.quant.autoclip import select_head_clip
        head_clip, _ = select_head_clip(version, params_fp32, cfg,
                                        calib_batches)
    pipe_kw = dict(max_images=max_images, head_clip=head_clip,
                   states=states, act_percentile=act_percentile,
                   weight_bitwidth=weight_bitwidth,
                   per_channel=per_channel)
    if family == "slim":
        from yolo_tpu.quant.int8_graph import (
            make_int8_detect_fn, quantize_pipeline)
        m = quantize_pipeline(
            params_fp32, cfg, calib_batches,
            fold_bn=not version.endswith("_q_bf"), **pipe_kw)
        return m, make_int8_detect_fn(m, cfg, rounding=rounding,
                                      **maker_kwargs)
    if family == "tiny":
        from yolo_tpu.quant.int8_models import (
            make_int8_tiny_detect_fn, quantize_pipeline_tiny)
        m = quantize_pipeline_tiny(params_fp32, cfg, calib_batches,
                                   **pipe_kw)
        return m, make_int8_tiny_detect_fn(m, cfg, rounding=rounding,
                                           **maker_kwargs)
    if family == "v2":
        from yolo_tpu.quant.int8_models import (
            make_int8_yolo_v2_detect_fn, quantize_pipeline_yolo_v2)
        m = quantize_pipeline_yolo_v2(params_fp32, cfg, calib_batches,
                                      **pipe_kw)
        return m, make_int8_yolo_v2_detect_fn(m, cfg, rounding=rounding,
                                              **maker_kwargs)
    # v3 / v3_spp
    from yolo_tpu.quant.int8_yolo_v3 import (
        make_int8_yolo_v3_detect_fn, quantize_pipeline_yolo_v3)
    m = quantize_pipeline_yolo_v3(params_fp32, cfg, calib_batches,
                                  spp=(family == "v3_spp"), **pipe_kw)
    return m, make_int8_yolo_v3_detect_fn(m, cfg, rounding=rounding,
                                          **maker_kwargs)


def input_scale_exponent(int8_model) -> int:
    """The input activation scale exponent sa_in of any family's integer
    model — what the host-side quantizer (native preprocess int8_scale)
    must use so the graph's int8 input matches bit-exactly."""
    sa = getattr(int8_model, "sa_in", None)
    if sa is not None:
        return int(sa)
    return int(int8_model.sa["in"])
