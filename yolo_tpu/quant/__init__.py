"""Compression toolchain: functional weight/graph transforms.

Pipeline (mirrors the reference script chain, SURVEY.md §1):
  trained FP32 params
    -> fold_batch_norm (bn_fold.py; reference conv+bn2conv.py)
    -> retune low-LR fine-tune (retune.py; reference retune_bias_quantize.py)
    -> PTQ calibration: pow2 weight/bias fake-quant + activation range
       trackers (ptq.py; reference retune_bias_quantize.py -q)
    -> optional QAT: STE fine-tune THROUGH the fake-quant forward
       (qat.py; the gradient step the reference's retune -q skips)
    -> accumulator-overflow retune-shift search (retune.py;
       reference retune_bias_quantize_findbest.py)
    -> integer INT8 graph + exported exponent tables (fixed_point.py,
       int8_graph.py; reference c_embedding/yolo_forward.c)
"""

from yolo_tpu.quant.bn_fold import fold_batch_norm  # noqa: F401
from yolo_tpu.quant.quantize import (  # noqa: F401
    fake_quantize,
    pow2_scale,
    quantize_pow2,
    tracker_init,
    tracker_quantize,
)
