"""Streaming serving benchmark/demo: batched multi-stream detection.

The BASELINE.json "batched multi-stream camera pipeline" config: frames
(camera, video, or synthetic) -> native preprocess -> one jitted INT8
detect at a fixed batch -> per-frame boxes.

python -m yolo_tpu.cli.serve -d synthetic --batch 64 --iters 20
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from yolo_tpu.cli.common import add_common_args, build_cfg
from yolo_tpu.serving import StreamingDetector


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="yolo_tpu serving bench")
    add_common_args(parser)
    parser.add_argument("--trained_model", default=None)
    parser.add_argument("--artifact", default=None,
                        help="serve a frozen jax.export artifact "
                             "(quantize export --artifact): no model "
                             "code, weights, or calibration — the blob "
                             "header supplies the input mode, "
                             "quantization exponent, batch and "
                             "resolution")
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--source", default="synthetic",
                        help="synthetic | video path | camera index")
    parser.add_argument("--fp32", action="store_true", default=False,
                        help="serve the FP32 graph instead of INT8")
    parser.add_argument("--input", default="auto",
                        choices=["auto", "s2d", "int8", "f32"],
                        help="host->device input mode: s2d (int8 in the "
                        "padded space-to-depth layout), int8 "
                        "(host-quantized NHWC), f32 (quantize in-graph)."
                        " auto picks the measured-best per family: int8 "
                        "for yolo_v2 at batch>=128 (its s2d entry form "
                        "loses there — docs/PERFORMANCE.md), s2d "
                        "otherwise")
    return parser.parse_args(argv)


def _frames(args, cfg, n):
    if args.source == "synthetic":
        rng = np.random.default_rng(0)
        return [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
                for _ in range(n)]
    import cv2
    src = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(src)
    frames = []
    while len(frames) < n:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def _trained_or_none(args, cfg):
    """Load --trained_model into an fp32 param tree, or None (random
    weights -> structurally-real perf demo, like the bench scripts)."""
    if not args.trained_model:
        return None
    from yolo_tpu.cli.eval import load_params
    from yolo_tpu.detector import Detector
    return load_params(args, Detector(cfg))


def _serve_artifact(args):
    """Serve a frozen jax.export artifact: the blob header supplies the
    input contract, so no model/quantization code runs here at all."""
    from yolo_tpu.serving.export import load_artifact

    detect, meta = load_artifact(args.artifact, with_meta=True)
    if not meta:
        raise SystemExit(
            f"{args.artifact} has no metadata header — re-export with "
            f"'quantize export --artifact' (raw blobs can still be "
            f"served programmatically via load_artifact)")
    h, w = meta["input_size"]
    batch = meta["batch"]
    cfg = build_cfg(args).with_input_size((h, w))
    mode = meta["input"]
    sd = StreamingDetector(
        cfg, detect, batch_size=batch,
        sa_in=(meta["sa_in"] if mode in ("s2d", "int8") else None),
        s2d=(mode == "s2d"))
    frames = _frames(args, cfg, batch)
    print(f"artifact: {args.artifact} ({meta.get('version')}, input "
          f"{mode}, batch {batch}, {h}x{w})")

    results = sd.detect_frames(frames[:4])
    for i, (boxes, scores, classes) in enumerate(results):
        print(f"frame {i}: {len(scores)} detections")
    fps = sd.benchmark(frames, iters=args.iters, overlap=True)
    print(f"end-to-end throughput: {fps:.1f} frames/sec "
          f"(batch {batch}, {h}x{w}, frozen artifact)")
    return fps


def main(args=None):
    args = args or parse_args()
    if args.artifact:
        return _serve_artifact(args)
    cfg = build_cfg(args)
    if args.input == "auto":
        # measured per-family best (docs/PERFORMANCE.md input-mode
        # table): yolo_v2's s2d block-conv entry loses at b128+
        args.input = ("int8" if args.version == "yolo_v2"
                      and args.batch >= 128 else "s2d")

    import jax

    sa_in = None
    s2d = False
    if args.fp32:
        from yolo_tpu.cli.eval import load_params
        from yolo_tpu.detector import Detector
        det = Detector(cfg)
        params = load_params(args, det)
        detect = lambda im: det.detect(params, im)  # noqa: E731
    else:
        # every family through its own true-integer engine
        # (quant/dispatch.py); all detect fns take float32,
        # host-quantized int8, or the s2d serving layout
        from yolo_tpu.detector import Detector
        from yolo_tpu.quant.dispatch import (build_int8_detector,
                                             input_scale_exponent)
        params = _trained_or_none(args, cfg)
        if params is None:
            params = Detector(cfg).init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        h, w = cfg.input_size
        calib = [rng.random((8, h, w, 3), dtype=np.float32)
                 for _ in range(4)]
        s2d = args.input == "s2d"
        m, detect = build_int8_detector(args.version, params, cfg, calib,
                                        input_s2d=s2d)
        if args.input in ("s2d", "int8"):
            sa_in = input_scale_exponent(m)
    sd = StreamingDetector(cfg, detect, batch_size=args.batch,
                           sa_in=sa_in, s2d=s2d)
    frames = _frames(args, cfg, args.batch)
    print(f"native preprocess: {sd._native is not None}; "
          f"host-side int8 quantize: {sa_in is not None}; "
          f"s2d input layout: {s2d}")

    results = sd.detect_frames(frames[:4])
    for i, (boxes, scores, classes) in enumerate(results):
        print(f"frame {i}: {len(scores)} detections")

    fps_seq = sd.benchmark(frames, iters=args.iters, overlap=False)
    fps = sd.benchmark(frames, iters=args.iters, overlap=True)
    print(f"end-to-end throughput: {fps:.1f} frames/sec "
          f"(batch {args.batch}, {cfg.input_size[0]}x{cfg.input_size[1]},"
          f" {'FP32' if args.fp32 else 'INT8'}); "
          f"prefetch overlap gain {fps / max(fps_seq, 1e-9):.2f}x "
          f"over sequential {fps_seq:.1f}")
    return fps


if __name__ == "__main__":
    main()
