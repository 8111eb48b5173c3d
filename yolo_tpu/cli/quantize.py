"""Compression-pipeline entry point: the reference's four scripts
(conv+bn2conv.py, retune_bias_quantize.py, retune_bias_quantize.py -q,
retune_bias_quantize_findbest.py) as subcommands of one driver.

python -m yolo_tpu.cli.quantize bnfold  -d synthetic -r ckpt.msgpack
python -m yolo_tpu.cli.quantize retune  -d synthetic -r fused.msgpack
python -m yolo_tpu.cli.quantize ptq     -d synthetic -r fused.msgpack
python -m yolo_tpu.cli.quantize findbest -d synthetic -r fused.msgpack
python -m yolo_tpu.cli.quantize export  -d synthetic -r fused.msgpack \\
    --header weight.h
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from yolo_tpu.cli.common import add_common_args, build_cfg, build_dataset
from yolo_tpu.detector import Detector
from yolo_tpu.eval.voc_eval import VOCEvaluator
from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="yolo_tpu compression")
    parser.add_argument("stage", choices=["bnfold", "retune", "qat",
                                          "ptq", "findbest", "export"])
    add_common_args(parser)
    parser.add_argument("-r", "--resume", required=False, default=None,
                        help="input checkpoint (.msgpack or .pth)")
    parser.add_argument("--out", default=None, help="output checkpoint")
    parser.add_argument("--header", default="weight.h",
                        help="C header path for export")
    parser.add_argument("--artifact", default=None,
                        help="export stage: also write a serialized "
                             "serving artifact (jax.export StableHLO "
                             "with weights baked in) to this path")
    parser.add_argument("--artifact_input", default="f32",
                        choices=["f32", "int8", "s2d"],
                        help="input mode the artifact is exported for "
                             "(s2d = the fastest serving layout; the "
                             "mode + quantization exponent are recorded "
                             "in the artifact header for cli.serve "
                             "--artifact)")
    parser.add_argument("--calib_images", type=int, default=1000)
    parser.add_argument("--head_clip", default="auto",
                        help="prediction-head range cap: a float, "
                             "'none', or 'auto' (sweep caps and pick by "
                             "detection agreement; quant/autoclip.py)")
    parser.add_argument("--act_percentile", default="none",
                        help="per-tracker activation clip: a percentile "
                             "float (e.g. 99.9), 'none' (reference "
                             "abs-max), or 'auto' (full config search: "
                             "cap sweep + percentile sweep, "
                             "quant.autoclip.select_quant_config)")
    parser.add_argument("--greedy", type=int, default=0,
                        help="with --act_percentile auto: greedy "
                             "per-tracker refinement rounds (each round "
                             "~n_trackers engine rebuilds)")
    parser.add_argument("--per_channel", action="store_true",
                        default=False,
                        help="per-output-channel weight scales (TPU "
                             "serving opt-in; incompatible with the "
                             "weight.h shift-chain export)")
    parser.add_argument("--weight_bits", type=int, default=8,
                        choices=[4, 5, 6, 8],
                        help="weight bitwidth (sub-8-bit levels are a "
                             "subset of int8, so engines and exports "
                             "are unchanged; pair with --per_channel "
                             "below 6 bits — docs/PARITY.md)")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=None,
                        help="fine-tune LR (default: 1e-7 for retune, "
                             "1e-5 for qat)")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--eval_every", type=int, default=0,
                        help="retune: eval every N steps and keep the "
                             "best checkpoint (0 = once per dataset "
                             "epoch, like the reference driver)")
    parser.add_argument("--no_eval", action="store_true", default=False)
    return parser.parse_args(argv)


def _load(args, det):
    if args.resume is None:
        return det.init_params(jax.random.PRNGKey(0))
    if args.resume.endswith(".pth"):
        from yolo_tpu.utils.checkpoint import load_torch_slim_yolo_v2
        params, _ = load_torch_slim_yolo_v2(
            args.resume, fused=args.version.endswith("_q_bf"))
        return params
    params, _ = load_checkpoint(args.resume)
    return params


def _calib_batches(args, cfg):
    dataset = build_dataset(args, cfg, train=False)
    batches, seen = [], 0
    for start in range(0, len(dataset), args.batch_size):
        idx = range(start, min(start + args.batch_size, len(dataset)))
        batches.append(np.stack(
            [dataset.pull_item(i)[0] for i in idx]).astype(np.float32))
        seen += len(batches[-1])
        if seen > args.calib_images:
            break
    return batches


def _maybe_eval(args, cfg, detect_fn, label):
    if args.no_eval:
        return None
    dataset = build_dataset(args, cfg, train=False)
    ev = VOCEvaluator(dataset, cfg.num_classes, cfg.input_size,
                      batch_size=args.batch_size)
    mean_ap = ev.evaluate(detect_fn)
    print(f"[{label}] mAP = {mean_ap:.4f}")
    return mean_ap


def _export_artifact_generic(args, cfg):
    """Serialized serving artifact for ANY family via the int8 dispatch
    (quant/dispatch.py); the blob header records the input contract."""
    from yolo_tpu.quant.dispatch import (build_int8_detector,
                                         input_scale_exponent)
    from yolo_tpu.serving.export import save_artifact

    det = Detector(cfg, batch_norm=True)
    params = _load(args, det)
    batches = _calib_batches(args, cfg)
    head_clip = args.head_clip
    if head_clip == "none":
        head_clip = None
    elif head_clip != "auto":
        head_clip = float(head_clip)
    mode = args.artifact_input
    m, detect = build_int8_detector(
        args.version, params, cfg, batches, head_clip=head_clip,
        max_images=args.calib_images, input_s2d=(mode == "s2d"),
        weight_bitwidth=(None if args.weight_bits == 8
                         else args.weight_bits),
        per_channel=args.per_channel)
    h, w = cfg.input_size
    if mode == "s2d":
        spec = jax.ShapeDtypeStruct(
            (args.batch_size, h // 2 + 3, w // 2 + 3, 12), np.int8)
    else:
        spec = jax.ShapeDtypeStruct(
            (args.batch_size, h, w, 3),
            np.int8 if mode == "int8" else np.float32)
    meta = {"version": args.version, "input": mode,
            "sa_in": (None if mode == "f32"
                      else input_scale_exponent(m)),
            "batch": args.batch_size, "input_size": [h, w]}
    save_artifact(detect, spec, args.artifact, meta=meta)
    print(f"wrote {args.artifact} ({args.version}, batch "
          f"{args.batch_size}, input {mode}; serve via 'python -m "
          f"yolo_tpu.cli.serve --artifact {args.artifact}')")
    return args.artifact


def main(args=None):
    args = args or parse_args()
    cfg = build_cfg(args)

    if args.stage == "bnfold":
        from yolo_tpu.quant.bn_fold import fold_batch_norm
        det = Detector(cfg, batch_norm=True)
        params = _load(args, det)
        fused = fold_batch_norm(params)
        det_f = Detector(cfg, batch_norm=False)
        _maybe_eval(args, cfg, lambda im: det_f.detect(fused, im), "bnfold")
        out = args.out or (args.resume or "model").replace(
            ".msgpack", "") + "_bnfuse.msgpack"
        save_checkpoint(out, fused)
        print(f"saved {out}")
        return fused

    det = Detector(cfg, batch_norm=False)
    params = _load(args, det)

    if args.stage == "retune":
        from yolo_tpu.data.loader import BatchLoader
        from yolo_tpu.quant.retune import retune_finetune
        from yolo_tpu.train.targets import build_targets
        dataset = build_dataset(args, cfg, train=True)
        loader = BatchLoader(dataset, args.batch_size)

        def batches():
            while True:
                for images, targets in loader:
                    yield images, build_targets(cfg, targets)

        lr = args.lr if args.lr is not None else 1e-7
        eval_fn, eval_every = None, 0
        if not args.no_eval:
            # per-"epoch" eval + best-checkpoint selection, matching the
            # reference driver (retune_bias_quantize.py:374-420)
            val = build_dataset(args, cfg, train=False)
            ev = VOCEvaluator(val, cfg.num_classes, cfg.input_size,
                              batch_size=args.batch_size)
            eval_fn = lambda p: ev.evaluate(lambda im: det.detect(p, im))
            eval_every = args.eval_every or max(
                1, len(dataset) // args.batch_size)
        params, metrics = retune_finetune(det, params, batches(),
                                          base_lr=lr, steps=args.steps,
                                          eval_fn=eval_fn,
                                          eval_every=eval_every)
        out = args.out or (args.resume or "model").replace(
            ".msgpack", "") + "_retune.msgpack"
        save_checkpoint(out, params)
        print(f"saved {out}")
        return params

    if args.stage == "qat":
        # Quantization-aware fine-tune: calibrate tracker scales on the
        # fake-quant graph, then train the fp32 masters THROUGH it with
        # STE (quant/qat.py — the gradient step the reference's retune -q
        # skips, retune_bias_quantize.py:358-369).
        from yolo_tpu.data.loader import BatchLoader
        from yolo_tpu.quant import generic
        from yolo_tpu.quant.qat import qat_finetune
        from yolo_tpu.train.targets import build_targets

        calib = _calib_batches(args, cfg)
        head_clip = args.head_clip
        if isinstance(head_clip, str):
            if head_clip == "none":
                head_clip = None
            elif head_clip == "auto":
                from yolo_tpu.quant.autoclip import select_head_clip
                head_clip, _ = select_head_clip(
                    args.version, params, cfg, calib, verbose=True)
                print(f"head_clip auto -> {head_clip}")
            else:
                head_clip = float(head_clip)
        wb = None if args.weight_bits == 8 else args.weight_bits
        params_q = generic.fake_quantize_all_convs(
            params, weight_bitwidth=wb, per_channel=args.per_channel)
        states = generic.calibrate_generic(
            det.module, params_q, cfg, calib,
            max_images=args.calib_images, head_clip=head_clip)

        dataset = build_dataset(args, cfg, train=True)
        loader = BatchLoader(dataset, args.batch_size)

        def batches():
            while True:
                for images, targets in loader:
                    yield images, build_targets(cfg, targets)

        lr = args.lr if args.lr is not None else 1e-5  # QAT default
        params, metrics = qat_finetune(det, params, states, batches(),
                                       base_lr=lr, steps=args.steps,
                                       weight_bitwidth=wb,
                                       per_channel=args.per_channel)
        if metrics is not None:
            print("qat final loss:",
                  float(jax.device_get(metrics["total_loss"])))
        if not args.no_eval:
            # Serve/eval with the FROZEN states QAT trained against —
            # re-calibrating on the tuned weights could shift a pow2
            # exponent away from the trained grid.
            _, _, detect_q = generic.quantize_detector(
                det, params, calib, fold_bn=False,
                max_images=args.calib_images, head_clip=head_clip,
                states=states, weight_bitwidth=wb,
                per_channel=args.per_channel)
            _maybe_eval(args, cfg, detect_q, "qat-int8sim")
        out = args.out or (args.resume or "model").replace(
            ".msgpack", "") + "_qat.msgpack"
        save_checkpoint(out, params)
        print(f"saved {out}")
        return params

    if args.stage == "export" and args.version not in (
            "slim_yolo_v2", "slim_yolo_v2_q_bf"):
        # family-generic artifact export (weight.h stays slim-only — it
        # is the reference C engine's hardcoded-schedule contract)
        if not args.artifact:
            raise SystemExit(
                f"export -v {args.version}: pass --artifact PATH (the "
                f"weight.h header export is slim-only)")
        return _export_artifact_generic(args, cfg)

    # ptq / findbest / export share the calibration pipeline
    from yolo_tpu.quant import qsim
    from yolo_tpu.quant.int8_graph import (
        make_int8_detect_fn, quantize_pipeline)
    from yolo_tpu.quant.retune import export_c_header, export_tables

    batches = _calib_batches(args, cfg)
    head_clip = args.head_clip
    states = None
    act_pct = args.act_percentile
    if act_pct == "auto":
        # full config search: cap sweep + per-tracker percentile sweep
        # (+ optional greedy refinement) by detection agreement
        from yolo_tpu.quant.autoclip import select_quant_config
        best, _info = select_quant_config(
            args.version, params, cfg, batches,
            greedy_rounds=args.greedy, verbose=True)
        print(f"config search -> head_clip {best['head_clip']}, "
              f"act_percentile {best['act_percentile']}, agreement "
              f"{best['score']:.4f}")
        states, head_clip, act_pct = best["states"], None, None
    else:
        act_pct = None if act_pct == "none" else float(act_pct)
        if isinstance(head_clip, str):
            if head_clip == "none":
                head_clip = None
            elif head_clip == "auto":
                from yolo_tpu.quant.autoclip import select_head_clip
                head_clip, scores = select_head_clip(
                    args.version, params, cfg, batches, verbose=True)
                print(f"head_clip auto -> {head_clip}")
            else:
                head_clip = float(head_clip)
    m = quantize_pipeline(params, cfg, batches, fold_bn=False,
                          max_images=args.calib_images,
                          head_clip=head_clip, states=states,
                          act_percentile=act_pct,
                          weight_bitwidth=(None if args.weight_bits == 8
                                           else args.weight_bits),
                          per_channel=args.per_channel)
    if args.per_channel:
        # per-channel sw has no one-scale-per-layer table form; the
        # weight.h contract stays per-tensor
        if args.stage == "export":
            raise SystemExit(
                "--per_channel engines cannot export to weight.h (one "
                "scale_w per layer, c_embedding/yolo_forward.c:32); "
                "drop --per_channel for embedded export or use "
                "--artifact via a non-per-channel build")
        tables = {"scale_b": m.sb, "scale_a": m.sa, "retune": m.retune}
        print("scale_w: per-channel (int8 TPU-serving engine)")
    else:
        tables = export_tables(m)
        print("scale_w:", tables["scale_w"])
    print("scale_b:", tables["scale_b"])
    print("scale_a:", tables["scale_a"])
    print("retune :", tables["retune"])

    if args.stage == "findbest":
        return tables

    if args.stage == "export":
        export_c_header(m, args.header)
        print(f"wrote {args.header}")
        if args.artifact:
            from yolo_tpu.quant.dispatch import input_scale_exponent
            from yolo_tpu.serving.export import save_artifact

            h, w = cfg.input_size
            mode = args.artifact_input
            if mode == "s2d":
                detect = make_int8_detect_fn(m, cfg, input_s2d=True)
                spec = jax.ShapeDtypeStruct(
                    (args.batch_size, h // 2 + 3, w // 2 + 3, 12),
                    np.int8)
            elif mode == "int8":
                detect = make_int8_detect_fn(m, cfg)
                spec = jax.ShapeDtypeStruct(
                    (args.batch_size, h, w, 3), np.int8)
            else:
                detect = make_int8_detect_fn(m, cfg)
                spec = jax.ShapeDtypeStruct(
                    (args.batch_size, h, w, 3), np.float32)
            meta = {"version": args.version, "input": mode,
                    "sa_in": (None if mode == "f32"
                              else input_scale_exponent(m)),
                    "batch": args.batch_size, "input_size": [h, w]}
            save_artifact(detect, spec, args.artifact, meta=meta)
            print(f"wrote {args.artifact} (batch {args.batch_size}, "
                  f"input {mode}; serve via 'python -m yolo_tpu.cli."
                  f"serve --artifact {args.artifact}' or "
                  f"yolo_tpu.serving.export.load_artifact)")
        return m

    # ptq: evaluate the quantized model
    detect = make_int8_detect_fn(m, cfg)
    _maybe_eval(args, cfg,
                lambda im: detect(np.asarray(im, np.float32)), "ptq-int8")
    out = args.out or (args.resume or "model").replace(
        ".msgpack", "") + "_retune_quantize.msgpack"
    if args.per_channel:
        saved_tables = {
            "scale_w": {k: np.asarray(v) for k, v in m.sw.items()},
            "scale_b": {k: np.asarray(v) for k, v in m.sb.items()},
            "scale_a": {k: np.asarray(v) for k, v in m.sa.items()},
            "retune": {k: np.asarray(v) for k, v in m.retune.items()},
        }
    else:
        saved_tables = {k: np.asarray(v) for k, v in tables.items()}
    save_checkpoint(out, {
        "w_q": m.w_q, "b_q": m.b_q, "tables": saved_tables,
    })
    print(f"saved {out}")
    return m


if __name__ == "__main__":
    main()
