"""End-to-end quantization parity check (the BASELINE.md north star).

Trains slim_yolo_v2 on the synthetic detection set, then measures mAP at
every compression stage:

  FP32 -> BN-fused -> fake-quant INT8 (PTQ sim) -> integer INT8 engine

and asserts the integer-engine mAP lands within 0.5 of FP32 (the
reference's acceptance bar for its quantized model).

Run on TPU:  python scripts/quant_parity.py [--epochs 40]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.data import BaseTransform, BatchLoader, SyntheticDetection
from yolo_tpu.data.transforms import SSDAugmentation
from yolo_tpu.detector import Detector
from yolo_tpu.eval.voc_eval import VOCEvaluator
from yolo_tpu.quant import qsim
from yolo_tpu.quant.bn_fold import fold_batch_norm
from yolo_tpu.quant.generic import quant_forward_generic
from yolo_tpu.quant.int8_graph import (
    make_int8_detect_fn, quantize_pipeline)
from yolo_tpu.train.targets import build_targets
from yolo_tpu.train.trainer import TrainConfig, lr_at, make_train_step


def main(epochs: int = 40, size: int = 64, batch: int = 16,
         ckpt: str = "/tmp/quant_parity_params.msgpack",
         skip_train: bool = False):
    from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(size, size),
                     conf_thresh=0.01)
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))

    # plain transform: synthetic classes are color-coded, so photometric
    # augmentation would erase the class signal
    train_ds = SyntheticDetection((size, size), num_classes=2, length=128,
                                  transform=BaseTransform((size, size)))
    val_ds = SyntheticDetection((size, size), num_classes=2, length=48,
                                transform=BaseTransform((size, size)),
                                seed=99)
    loader = BatchLoader(train_ds, batch, num_workers=4)
    evaluator = VOCEvaluator(val_ds, 2, (size, size), batch_size=16)

    if skip_train and os.path.exists(ckpt):
        params, _ = load_checkpoint(ckpt)
        print(f"loaded {ckpt}")
    else:
        tc = TrainConfig(base_lr=1e-3, wp_epoch=2, cos=True,
                         max_epoch=epochs)
        opt, step = make_train_step(det.module, cfg, tc, donate=False)
        opt_state = opt.init(params)
        t0 = time.time()
        for epoch in range(epochs):
            for it, (images, targets) in enumerate(loader):
                lr = lr_at(tc, epoch, it, len(loader))
                gt = build_targets(cfg, targets)
                params, opt_state, metrics = step(params, opt_state,
                                                  images, gt, lr)
            if (epoch + 1) % 10 == 0:
                print(f"epoch {epoch + 1}: loss="
                      f"{float(metrics['total_loss']):.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        save_checkpoint(ckpt, params)

    results = {}
    results["fp32"] = evaluator.evaluate(
        lambda im: det.detect(params, im))

    fused = fold_batch_norm(params)
    det_f = Detector(cfg, batch_norm=False)
    results["bn_fused"] = evaluator.evaluate(
        lambda im: det_f.detect(fused, im))

    # PTQ calibration on training images
    calib = [loader_images for loader_images, _ in
             list(BatchLoader(train_ds, 16, shuffle=False,
                              num_workers=4))][:8]
    m = quantize_pipeline(params, cfg, calib)

    # fake-quant float sim (what the reference's quantized .pth computes)
    from yolo_tpu import detector as D
    from yolo_tpu.ops import nms as _nms

    params_q = qsim.fake_quantize_params(fused)
    states = qsim.calibrate(params_q, cfg, calib)
    qmod = qsim.make_quant_module(params_q, states)

    @jax.jit
    def _fq_detect(images):
        boxes, probs = D.predict(qmod, params_q, images, cfg)
        return _nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    results["int8_fakequant"] = evaluator.evaluate(
        lambda im: _fq_detect(np.asarray(im, np.float32)))

    # diagnostics: isolate weight-quant vs activation-quant damage
    results["weights_only_q"] = evaluator.evaluate(
        lambda im: det_f.detect(params_q, im))

    qmod_a = qsim.make_quant_module(fused, states)

    @jax.jit
    def _aq_detect(images):
        boxes, probs = D.predict(qmod_a, fused, images, cfg)
        return _nms.batched_postprocess(
            boxes, probs, cfg.conf_thresh, cfg.nms_thresh,
            cfg.pre_nms_top_k, cfg.top_k)

    results["acts_only_q"] = evaluator.evaluate(
        lambda im: _aq_detect(np.asarray(im, np.float32)))

    # true integer engine
    detect_int8 = make_int8_detect_fn(m, cfg)
    results["int8_integer"] = evaluator.evaluate(
        lambda im: detect_int8(np.asarray(im, np.float32)))

    # integer engine with the head-clip tracker (objectness logits
    # saturate through sigmoid, so capping their tracked range buys the
    # box/class channels ~8x finer resolution)
    m_hc = quantize_pipeline(params, cfg, calib, head_clip=16.0)
    detect_int8_hc = make_int8_detect_fn(m_hc, cfg)
    results["int8_headclip"] = evaluator.evaluate(
        lambda im: detect_int8_hc(np.asarray(im, np.float32)))

    # automatic cap selection (quant/autoclip.py): label-free detection
    # agreement on the calibration batches must find a cap that
    # matches/beats the hand-picked 16
    from yolo_tpu.quant.autoclip import select_head_clip

    auto_cap, cap_scores = select_head_clip(
        "slim_yolo_v2", params, cfg, calib, verbose=True)
    m_auto = quantize_pipeline(params, cfg, calib, head_clip=auto_cap)
    detect_int8_auto = make_int8_detect_fn(m_auto, cfg)
    results[f"int8_autoclip[{auto_cap}]"] = evaluator.evaluate(
        lambda im: detect_int8_auto(np.asarray(im, np.float32)))

    print("\n=== mAP by stage ===")
    for k, v in results.items():
        print(f"{k:>16}: {v:.4f}  (delta vs fp32: "
              f"{(v - results['fp32']) * 100:+.2f} points)")
    best = max(v for k, v in results.items() if k.startswith("int8_")
               and "fakequant" not in k)
    delta = (results["fp32"] - best) * 100
    print(f"\nbest int8 integer-engine delta: {delta:.2f} mAP points "
          f"({'PASS' if delta < 0.5 else 'CHECK'} vs the <=0.5 target)")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--skip_train", action="store_true", default=False)
    a = p.parse_args()
    main(epochs=a.epochs, size=a.size, skip_train=a.skip_train)
