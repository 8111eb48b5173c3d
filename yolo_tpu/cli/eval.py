"""mAP evaluation entry point (reference eval.py equivalent).

python -m yolo_tpu.cli.eval -v slim_yolo_v2 -d synthetic \\
    --trained_model weights/.../ckpt.msgpack [-q]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from yolo_tpu.cli.common import add_common_args, build_cfg, build_dataset
from yolo_tpu.detector import Detector
from yolo_tpu.eval.voc_eval import VOCEvaluator
from yolo_tpu.utils.checkpoint import load_checkpoint


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="yolo_tpu evaluation")
    add_common_args(parser)
    parser.add_argument("--trained_model", default=None,
                        help="checkpoint (.msgpack, or reference .pth)")
    parser.add_argument("-q", "--quantize", action="store_true",
                        default=False,
                        help="evaluate the INT8-quantized model")
    parser.add_argument("--batch_size", type=int, default=32)
    return parser.parse_args(argv)


def load_params(args, det):
    if args.trained_model is None:
        return det.init_params(jax.random.PRNGKey(0))
    if args.trained_model.endswith(".pth"):
        from yolo_tpu.utils.checkpoint import load_torch_slim_yolo_v2
        params, _ = load_torch_slim_yolo_v2(
            args.trained_model, fused=args.version.endswith("_q_bf"))
        return params
    params, _ = load_checkpoint(args.trained_model)
    return params


def evaluate(args=None):
    args = args or parse_args()
    cfg = build_cfg(args)
    det = Detector(cfg, batch_norm=not args.version.endswith("_q_bf"))
    params = load_params(args, det)

    dataset = build_dataset(args, cfg, train=False)
    evaluator = VOCEvaluator(dataset, cfg.num_classes, cfg.input_size,
                             batch_size=args.batch_size, display=True)

    if args.quantize:
        from yolo_tpu.quant.dispatch import build_int8_detector
        calib = [np.stack([dataset.pull_item(i)[0] for i in
                           range(min(16, len(dataset)))])]
        _, detect = build_int8_detector(args.version, params, cfg, calib)
        mean_ap = evaluator.evaluate(lambda imgs: detect(
            np.asarray(imgs, np.float32)))
    else:
        mean_ap = evaluator.evaluate(lambda imgs: det.detect(params, imgs))
    print(f"Mean AP: {mean_ap:.4f}")
    return mean_ap


if __name__ == "__main__":
    evaluate()
