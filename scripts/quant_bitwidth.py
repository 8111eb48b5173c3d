"""Sub-8-bit weight quantization study (compression axis beyond the
reference, which is INT8-only — retune_bias_quantize.py:73-86 hardcodes
num_bits=8).

Weights are quantized at 8/6/5/4 bits (pow2 per-tensor scales);
activations and bias stay int8, so the integer engines, export formats
and shift semantics are untouched — b-bit levels are a subset of int8,
only the per-layer sw exponents move. Each width gets its own
calibration + retune search on the b-bit weights and is served through
the true integer engine with the autoclip head cap; mAP is reported
with a paired bootstrap 95% CI against the 8-bit engine (the relevant
pair for "how much accuracy does each dropped bit cost").

``--per_channel`` additionally measures every width with per-OUTPUT-
CHANNEL pow2 weight scales (VERDICT r4 next #5): the TPU-serving
opt-in where the requant is a [1,1,1,C] epilogue shift — per-tensor
scales are what make w4/w5 collapse, so this is the recovery axis.
weight.h export stays per-tensor (the embedded shift-chain contract).

Run on TPU (reuses the quant_parity checkpoint):
  python scripts/quant_bitwidth.py --ckpt /tmp/quant_parity_slim_416_hard.msgpack \
      --size 416 --hard --per_channel
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.data import BaseTransform, BatchLoader, SyntheticDetection
from yolo_tpu.eval.voc_eval import VOCEvaluator, bootstrap_delta_ci
from yolo_tpu.quant.autoclip import select_head_clip
from yolo_tpu.quant.int8_graph import (make_int8_detect_fn,
                                       quantize_pipeline)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--val", type=int, default=1024)
    ap.add_argument("--bits", type=int, nargs="+", default=[8, 6, 5, 4])
    ap.add_argument("--per_channel", action="store_true",
                    help="also measure per-output-channel weight scales "
                         "at every width (TPU-serving opt-in)")
    ap.add_argument("--hard", action="store_true",
                    help="crowded/small-object synthetic regime (must "
                         "match the checkpoint's training regime)")
    ap.add_argument("--ckpt",
                    default="/tmp/quant_parity_params.msgpack")
    ap.add_argument("--n_boot", type=int, default=300)
    ap.add_argument("--qat_steps", type=int, default=0,
                    help="additionally QAT-fine-tune each width against "
                         "its exact serving grid (weight_bitwidth + "
                         "per_channel threaded into the STE forward) "
                         "and measure the re-quantized engine")
    ap.add_argument("--qat_lr", type=float, default=1e-6)
    ap.add_argument("--train_images", type=int, default=128,
                    help="QAT feed size (must match the checkpoint's "
                         "training set for the synthetic regime)")
    ap.add_argument("--out", default=None,
                    help="write the result table to this JSON path")
    args = ap.parse_args(argv)

    from yolo_tpu.utils.checkpoint import load_checkpoint

    size = args.size
    cfg = get_config("slim_yolo_v2", "mask", input_size=(size, size),
                     conf_thresh=0.01)
    if not os.path.exists(args.ckpt):
        raise SystemExit(
            f"{args.ckpt} not found — train one first via "
            f"scripts/quant_parity.py (it caches its checkpoint there)")
    params, _ = load_checkpoint(args.ckpt)

    train_ds = SyntheticDetection((size, size), num_classes=2,
                                  length=args.train_images, hard=args.hard,
                                  transform=BaseTransform((size, size)))
    val_ds = SyntheticDetection((size, size), num_classes=2,
                                length=args.val, hard=args.hard,
                                transform=BaseTransform((size, size)),
                                seed=99)
    evaluator = VOCEvaluator(val_ds, 2, (size, size), batch_size=64)
    calib = [images for images, _ in
             list(BatchLoader(train_ds, 16, shuffle=False,
                              num_workers=0))][:8]

    cap, _ = select_head_clip("slim_yolo_v2", params, cfg, calib)
    print(f"autoclip head cap: {cap}")

    qat_feed = None
    if args.qat_steps > 0:
        # device-resident QAT feed: samples + targets upload once, each
        # step slices on device (quant_parity.py's pattern)
        import jax.numpy as jnp

        from yolo_tpu.train.targets import build_targets

        _imgs, _tgts = [], []
        for i in range(len(train_ds)):
            img, target, _, _ = train_ds.pull_item(i)
            _imgs.append(np.asarray(img, np.float32))
            _tgts.append(np.asarray(target).reshape(-1, 5))
        _X = jnp.asarray(np.stack(_imgs))
        _G = jnp.asarray(np.asarray(build_targets(cfg, _tgts),
                                    np.float32))

        def qat_feed(seed=1, batch=16):
            rng = np.random.default_rng(seed)
            n = _X.shape[0]
            while True:
                idx = rng.integers(0, n, batch)
                yield _X[idx], _G[idx]

    results, raw, tables = {}, {}, {}
    variants = [(bits, False) for bits in args.bits]
    if args.per_channel:
        variants += [(bits, True) for bits in args.bits]
    for bits, pc in variants:
        m = quantize_pipeline(params, cfg, calib, head_clip=cap,
                              weight_bitwidth=bits, per_channel=pc)
        detect = make_int8_detect_fn(m, cfg)
        name = f"w{bits}a8" + ("/pc" if pc else "")
        results[name] = evaluator.evaluate(
            lambda im, d=detect: d(np.asarray(im, np.float32)))
        raw[name] = evaluator.raw
        tables[name] = {
            "sw": {k: (np.asarray(v).tolist() if np.ndim(v) else v)
                   for k, v in m.sw.items()},
            "retune": dict(m.retune)}
        wmax = max(int(np.abs(np.asarray(w)).max())
                   for w in m.w_q.values())
        assert wmax <= 2 ** (bits - 1) - 1, (bits, wmax)
        print(f"  [{name}] mAP = {results[name]:.4f} "
              f"(max |w_q| = {wmax})", flush=True)

        if args.qat_steps > 0:
            # QAT against the EXACT serving grid of this variant:
            # weight STE at (bits, per_channel), activation taps on the
            # frozen states calibrated at this width, then rebuild the
            # integer engine from the tuned masters on the SAME states.
            import time as _time

            from yolo_tpu.detector import Detector
            from yolo_tpu.quant import qsim
            from yolo_tpu.quant.bn_fold import fold_batch_norm
            from yolo_tpu.quant.qat import qat_finetune, states_from_qsim

            det_f = Detector(cfg, batch_norm=False)
            fused = fold_batch_norm(params)
            params_qw = qsim.fake_quantize_params(
                fused, weight_bitwidth=bits, per_channel=pc)
            st = qsim.calibrate(params_qw, cfg, calib, head_clip=cap)
            t0 = _time.time()
            tuned, _ = qat_finetune(det_f, fused, states_from_qsim(st),
                                    qat_feed(), base_lr=args.qat_lr,
                                    steps=args.qat_steps,
                                    weight_bitwidth=bits, per_channel=pc)
            m_q = quantize_pipeline(tuned, cfg, calib, fold_bn=False,
                                    states=st, weight_bitwidth=bits,
                                    per_channel=pc)
            detect_q = make_int8_detect_fn(m_q, cfg)
            qname = name + "+qat"
            results[qname] = evaluator.evaluate(
                lambda im, d=detect_q: d(np.asarray(im, np.float32)))
            raw[qname] = evaluator.raw
            print(f"  [{qname}] mAP = {results[qname]:.4f} "
                  f"({args.qat_steps} steps in {_time.time() - t0:.0f}s)",
                  flush=True)

    base = f"w{args.bits[0]}a8"
    _, gts = raw[base]
    print(f"\n=== weight-bitwidth sweep (slim, {args.val} val images, "
          f"vs {base}, paired bootstrap 95% CI) ===")
    ci_rows = {}
    for name, v in results.items():
        if name == base:
            print(f"{name:>8}: {v:.4f}")
            continue
        d, lo, hi = bootstrap_delta_ci(raw[name][0], raw[base][0], gts,
                                       n_boot=args.n_boot)
        ci_rows[name] = (d * 100, lo * 100, hi * 100)
        print(f"{name:>10}: {v:.4f}  delta {d * 100:+.2f} pts  "
              f"[{lo * 100:+.2f}, {hi * 100:+.2f}]")
    # the per-channel / QAT recovery claims get their own paired interval
    pairs = [(f"w{bits}a8/pc", f"w{bits}a8",
              f"per-channel vs per-tensor @w{bits}")
             for bits in args.bits]
    pairs += [(n + "+qat", n, f"QAT vs PTQ @{n}")
              for n in list(results) if not n.endswith("+qat")]
    for a, b, label in pairs:
        if a in raw and b in raw:
            d, lo, hi = bootstrap_delta_ci(raw[a][0], raw[b][0], gts,
                                           n_boot=args.n_boot)
            ci_rows[f"{a}_vs_{b}"] = (d * 100, lo * 100, hi * 100)
            print(f"{label}: {d * 100:+.2f} "
                  f"pts  [{lo * 100:+.2f}, {hi * 100:+.2f}]")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"map": results, "delta_ci_pts_vs_w8": ci_rows,
                       "head_clip": cap, "val_images": args.val,
                       "input_size": size, "hard": args.hard,
                       "sw_tables": tables}, f, indent=1)
        print(f"wrote {args.out}")
    return results


if __name__ == "__main__":
    main()
