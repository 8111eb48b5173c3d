"""Whole-pipeline INT8 detection graph: quantize -> int8 backbone ->
decode -> NMS, one jitted XLA program.

This is the TPU serving equivalent of the reference's embedded pipeline
(c_embedding/yolo_forward.c:1181-1282): the C engine's tiled conv
schedule becomes MXU int8 convs, its software tail (sigmoid/decode/
get_boxes/NMS, yolo_forward.c:965-1147) fuses into the same XLA program
with fixed shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import DetectorConfig
from yolo_tpu.detector import decode_all_boxes
from yolo_tpu.ops import blocks, decode, nms
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant import qsim


def int8_predict(m: fp.Int8Model, images, cfg: DetectorConfig,
                 rounding: str = "nearest", backend: str = "xla",
                 s2d_layers: tuple = (), input_s2d: bool = False,
                 pack_tail: bool = False):
    """images -> (boxes_norm [B, N, 4], class_probs [B, N, C]).

    ``images`` is either float32 (quantized in-graph) or already int8 at
    scale 2^sa_in — the host-side-quantize pattern of the reference's
    embedded engine (c_embedding/yolo_forward.c:57-85 quantizes on the
    ARM before the accelerator sees data); feeding int8 moves 4x fewer
    bytes over PCIe/DMA. With ``input_s2d`` the int8 input is already
    the padded space-to-depth layout (fp.s2d_input) and conv1 runs the
    fused MXU conv+pool with zero on-device transform cost.
    """
    if images.dtype == jnp.int8:
        x_q = images
    else:
        x_q = fp.quantize_input(images, m.sa["in"])
        if input_s2d:
            x_q = fp.s2d_input(x_q)
    if backend == "pallas":
        head = fp.int8_forward_pallas(m, x_q, rounding)
    else:
        head = fp.int8_forward(m, x_q, rounding, s2d_layers=s2d_layers,
                               input_s2d=input_s2d, pack_tail=pack_tail)
    flat = blocks.flatten_grid(head)
    conf, cls, txt = decode.split_predictions(
        flat, cfg.anchors_per_scale, cfg.num_classes)
    h, w = cfg.input_size
    scale = jnp.asarray([w, h, w, h], jnp.float32)
    boxes = jnp.clip(decode_all_boxes([txt], cfg) / scale, 0.0, 1.0)
    probs = jax.nn.softmax(cls, axis=-1) * jax.nn.sigmoid(conf)
    return boxes, probs


def make_int8_detect_fn(m: fp.Int8Model, cfg: DetectorConfig,
                        rounding: str = "nearest", backend: str = "xla",
                        mesh=None, s2d_layers: tuple = (),
                        input_s2d: bool = False, spatial: bool = False,
                        pack_tail: bool = False):
    """Jitted end-to-end int8 detector:
    images [B, H, W, 3] float OR int8 -> (boxes, scores, classes, valid).

    int8 input must already be quantized at scale 2^m.sa['in'] (the
    native preprocessor's int8_scale output) — host->device traffic
    drops 4x and the in-graph quantize disappears. With ``input_s2d``
    int8 input must additionally be in the padded space-to-depth layout
    (fp.s2d_input_np / native layout='s2d'), the fastest serving path:
    conv1 executes as a fused MXU conv+pool (float input still works —
    the transform then runs on device).

    With ``mesh``, the batch shards over the 'data' axis (multi-chip
    serving): weights replicate, each chip runs its slice of the batch
    through conv+decode+NMS, outputs stay batch-sharded. With
    ``spatial`` the input additionally shards its HEIGHT over the
    mesh's 'space' axis — XLA inserts halo exchanges at every int8
    conv (lossless: integer arithmetic, same op order per output
    element, so results stay BIT-exact) and gathers before decode/NMS.
    Spatial mode requires plain NHWC input (not the s2d layout, whose
    padded block rows don't split on H)."""
    if spatial and input_s2d:
        raise ValueError("spatial sharding requires NHWC input "
                         "(input_s2d=False)")
    if spatial and mesh is None:
        raise ValueError("spatial=True requires a mesh with a 'space' "
                         "axis (parallel.make_mesh(data=, space=))")

    def body(images):
        fp.check_serving_input(images, cfg, input_s2d)
        boxes, probs = int8_predict(m, images, cfg, rounding, backend,
                                    s2d_layers, input_s2d, pack_tail)
        return nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    if mesh is None:
        return jax.jit(body)

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sh = NamedSharding(mesh, P("data"))
    in_sh = (NamedSharding(mesh, P("data", "space")) if spatial
             else batch_sh)
    return jax.jit(body, in_shardings=in_sh,
                   out_shardings=(batch_sh,) * 4)


def quantize_pipeline(params_fp32, cfg: DetectorConfig,
                      calib_batches: Iterable[np.ndarray],
                      fold_bn: bool = True,
                      max_images: int = 1000,
                      head_clip: Optional[float] = None,
                      states: Optional[dict] = None,
                      weight_bitwidth: Optional[int] = None,
                      act_percentile: Optional[float] = None,
                      per_channel: bool = False
                      ) -> fp.Int8Model:
    """Full PTQ pipeline: fold BN -> fake-quant weights -> calibrate
    activation ranges -> search retune shifts -> integer model.

    One function replacing the reference's four-script chain
    (conv+bn2conv.py -> retune_bias_quantize.py -q ->
    retune_bias_quantize_findbest.py -> manual weight export).

    Pass ``states`` (a qsim tracker-state dict) to SKIP calibration and
    build the engine on those frozen activation scales — e.g. the exact
    states a QAT fine-tune trained against. The retune-shift search
    still runs (it depends on the weights, not on new data).

    ``weight_bitwidth``: quantize weights below 8 bits (4/5/6) — the
    calibration, retune search, and integer model all see the b-bit
    weights; activations/bias stay int8 (scripts/quant_bitwidth.py).

    ``act_percentile``: per-tracker outlier clip during calibration
    (track the q-th percentile of |act| instead of the abs-max;
    quant/autoclip.py searches the best value by detection agreement).

    ``per_channel``: per-OUTPUT-CHANNEL pow2 weight scales instead of
    per-tensor — a TPU-serving opt-in (the requant becomes a [1,1,1,C]
    shift in the conv epilogue, free under XLA fusion). Breaks the
    weight.h shift-chain export contract, so the embedded path keeps
    per-tensor (reference retune_bias_quantize.py:73-86).
    """
    from yolo_tpu.quant.bn_fold import fold_batch_norm

    calib_batches = list(calib_batches)
    fused = fold_batch_norm(params_fp32) if fold_bn else params_fp32
    params_q = qsim.fake_quantize_params(fused,
                                         weight_bitwidth=weight_bitwidth,
                                         per_channel=per_channel)
    if states is None:
        states = qsim.calibrate(params_q, cfg, calib_batches,
                                max_images=max_images,
                                head_clip=head_clip,
                                act_percentile=act_percentile)
    retune = qsim.find_retune_exponents(params_q, cfg, states,
                                        calib_batches)
    return fp.quantize_model(fused, states, retune,
                             weight_bitwidth=weight_bitwidth,
                             per_channel=per_channel)


def build_int8_detect(cfg: DetectorConfig,
                      params_fp32=None,
                      calib_batches: Optional[Iterable] = None,
                      rounding: str = "nearest",
                      backend: str = "xla",
                      **detect_kwargs) -> Tuple:
    """Convenience/bench entry: returns (jitted fn(params_ignored, images),
    Int8Model). Without trained params, random weights + synthetic
    calibration produce a structurally-real int8 graph (for perf work).
    ``detect_kwargs`` (input_s2d=, s2d_layers=, mesh=) pass through to
    make_int8_detect_fn."""
    if params_fp32 is None:
        from yolo_tpu.models import slim_yolo_v2
        params_fp32 = slim_yolo_v2.init_params(
            jax.random.PRNGKey(0), cfg, batch_norm=True)
    if calib_batches is None:
        rng = np.random.default_rng(0)
        h, w = cfg.input_size
        calib_batches = [
            rng.random((8, h, w, 3), dtype=np.float32) for _ in range(4)]
    m = quantize_pipeline(params_fp32, cfg, calib_batches)
    detect = make_int8_detect_fn(m, cfg, rounding, backend,
                                 **detect_kwargs)

    def fn(_params, images):
        return detect(images)

    return fn, m
