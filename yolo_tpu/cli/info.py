"""Model FLOPs/params report (reference utils/com_paras_flops.py
equivalent, via XLA cost analysis instead of thop).

python -m yolo_tpu.cli.info -v yolo_v3 -d voc --input_size 416 416
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from yolo_tpu.cli.common import add_common_args, build_cfg
from yolo_tpu.detector import Detector
from yolo_tpu.utils.profiling import count_flops, count_params


def main(args=None):
    parser = argparse.ArgumentParser(description="model info")
    add_common_args(parser)
    args = args or parser.parse_args()
    cfg = build_cfg(args)
    det = Detector(cfg, batch_norm=not args.version.endswith("_q_bf"))
    params = det.init_params(jax.random.PRNGKey(0))
    x = np.zeros((1, *cfg.input_size, 3), np.float32)

    n_params = count_params(params)
    cost = count_flops(lambda p, im: det.module.forward(p, im, cfg),
                       params, x)
    print(f"model: {args.version} @ {cfg.input_size}")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"flops:  {cost['flops'] / 1e9:.2f} GFLOPs / image")
    print(f"bytes:  {cost['bytes accessed'] / 1e6:.1f} MB accessed")
    return n_params, cost


if __name__ == "__main__":
    main()
