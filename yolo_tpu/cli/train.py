"""Training entry point (reference train.py equivalent).

python -m yolo_tpu.cli.train -v slim_yolo_v2 -d synthetic --max_epoch 3
"""

from __future__ import annotations

import argparse
import itertools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.cli.common import add_common_args, build_cfg, build_dataset
from yolo_tpu.data.loader import BatchLoader, prefetch_iter
from yolo_tpu.detector import Detector
from yolo_tpu.eval.voc_eval import VOCEvaluator
from yolo_tpu.parallel import make_mesh, shard_batch, shard_params
from yolo_tpu.train.targets import build_targets
from yolo_tpu.train.trainer import (
    TrainConfig, lr_at, make_train_step, multi_scale_sizes)
from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


_resize_jits = {}


def _resize_batch(images: np.ndarray, size):
    """Bilinear resize of an NHWC batch to a multi-scale bucket (the
    reference uses F.interpolate on device, train.py:293).

    Returns a DEVICE array (one cached jit per shape pair): the batch
    stays on device between the resize and the train step instead of
    round-tripping through host memory every -ms iteration. uint8
    batches (the in-graph-normalize path) normalize inside the same jit
    before interpolating — matching the reference's order (normalize on
    the dataset side, interpolate the normalized tensor on device)."""
    if images.shape[1:3] == tuple(size):
        return images
    key = (images.shape, np.dtype(images.dtype).name, tuple(size))
    if key not in _resize_jits:
        from yolo_tpu.detector import normalize_u8

        b, _, _, c = images.shape
        out_shape = (b, size[0], size[1], c)

        def run(x):
            if x.dtype == jnp.uint8:
                x = normalize_u8(x)
            return jax.image.resize(x, out_shape, method="bilinear")

        _resize_jits[key] = jax.jit(run)
    return _resize_jits[key](images)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="yolo_tpu training")
    add_common_args(parser)
    parser.add_argument("-b", "--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--wp_epoch", type=int, default=2)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--max_epoch", type=int, default=260)
    parser.add_argument("-r", "--resume", default=None,
                        help="checkpoint to resume from")
    parser.add_argument("--pretrained_backbone", default=None,
                        help="reference ImageNet backbone .pth to "
                             "initialize from (darknet19/53/light, "
                             "matched to -v; reference train.py:174-213)")
    parser.add_argument("-ms", "--multi_scale", action="store_true",
                        default=False)
    parser.add_argument("--cos", action="store_true", default=False)
    parser.add_argument("--bf16", action="store_true", default=False,
                        help="bf16 mixed-precision compute (fp32 master "
                             "params/optimizer)")
    parser.add_argument("--fast_pool", type=int, default=0,
                        metavar="CIN_MAX",
                        help="trace entry conv+pool pairs (C_in <= CIN_MAX) "
                             "at pooled resolution via space-to-depth: same "
                             "math, MXU-tileable (try 32). 0 = exact "
                             "reference float trace (default)")
    parser.add_argument("--eval_epoch", type=int, default=10)
    parser.add_argument("--save_folder", default="weights/")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--f32_input", action="store_true", default=False,
                        help="host-normalized float32 batches instead of "
                             "the default raw-uint8 + in-graph normalize "
                             "path (4x more host->device traffic; exact "
                             "round-2 pipeline semantics)")
    parser.add_argument("--loader_workers", default="auto",
                        choices=["auto", "process", "thread"],
                        help="dataset worker pool kind (auto: threads "
                             "when the native augmentation backend is "
                             "available, else a forked process pool "
                             "like the reference DataLoader workers)")
    parser.add_argument("--mesh_data", type=int, default=None,
                        help="data-parallel mesh size (default: all devices)")
    parser.add_argument("--dcn", default=None, metavar="COORD,N,ID",
                        help="multi-host data parallelism: 'auto' to use "
                             "the TPU environment, or "
                             "'host:port,num_processes,process_id'")
    parser.add_argument("--debug", action="store_true", default=False)
    return parser.parse_args(argv)


def load_pretrained_backbone(version: str, path: str):
    """Dispatch the right ImageNet-backbone .pth importer for a model
    version (reference builds every big model on pretrained darknet
    weights, train.py:174-213 + backbone/darknet.py:258-328)."""
    from yolo_tpu.utils import checkpoint as ckpt

    loaders = {
        "yolo_v2": ckpt.load_torch_darknet19,
        "yolo_v3": ckpt.load_torch_darknet53,
        "yolo_v3_spp": ckpt.load_torch_darknet53,
        "tiny_yolo_v3": ckpt.load_torch_darknet_light,
    }
    if version not in loaders:
        raise ValueError(
            f"{version} has no pretrained backbone (reference trains "
            f"slim_yolo_v2 from scratch, train.py:201-205)")
    return loaders[version](path)


def train(args=None):
    args = args or parse_args()

    # multi-host DCN: join the job BEFORE any other jax use so the
    # backend sees the global device set (reference has only a
    # commented-out DataParallel here, train.py:218)
    if args.dcn:
        from yolo_tpu.parallel import distributed
        if args.dcn == "auto":
            distributed.initialize()
        else:
            coord, nproc, pid = args.dcn.rsplit(",", 2)
            distributed.initialize(coord, int(nproc), int(pid))

    cfg = build_cfg(args)
    det = Detector(cfg)

    save_dir = os.path.join(args.save_folder, args.dataset, args.version)
    os.makedirs(save_dir, exist_ok=True)

    dataset = build_dataset(args, cfg, train=True, u8=not args.f32_input)
    loader = BatchLoader(dataset, args.batch_size,
                         num_workers=args.num_workers,
                         workers=args.loader_workers,
                         process_id=jax.process_index(),
                         process_count=jax.process_count())
    val_dataset = build_dataset(args, cfg, train=False)
    evaluator = VOCEvaluator(val_dataset, cfg.num_classes, cfg.input_size)

    params = det.init_params(jax.random.PRNGKey(0))
    resume_extra = None
    if args.resume:
        print(f"resuming from {args.resume}")
        params, resume_extra = load_checkpoint(args.resume)
    elif args.pretrained_backbone:
        params = dict(params)
        params["backbone"] = load_pretrained_backbone(
            args.version, args.pretrained_backbone)
        print(f"loaded pretrained backbone {args.pretrained_backbone}")

    tc = TrainConfig(base_lr=args.lr, wp_epoch=args.wp_epoch,
                     max_epoch=args.max_epoch, cos=args.cos,
                     compute_dtype="bfloat16" if args.bf16 else None,
                     fast_pool_cin=args.fast_pool)
    # data-parallel mesh over as many devices as evenly divide the batch
    # (a debug batch of 4 on 8 devices uses a 4-device mesh, not a crash)
    multihost = jax.process_count() > 1
    if multihost:
        from yolo_tpu.parallel import distributed
        mesh = distributed.make_global_mesh()

        def shard(mesh, batch):
            return jax.tree_util.tree_map(
                lambda a: distributed.host_local_to_global(mesh, a), batch)
    else:
        import math
        n_dev = jax.device_count()
        data = (args.mesh_data if args.mesh_data is not None
                else math.gcd(args.batch_size, n_dev))
        mesh = (make_mesh(data=data, devices=jax.devices()[:data])
                if data > 1 else None)
        shard = shard_batch
    opt, step = make_train_step(det.module, cfg, tc, mesh=mesh)
    opt_state = opt.init(params)
    if resume_extra and "opt_state" in resume_extra:
        # full resume incl. SGD momentum (the reference loses it,
        # train.py:357-361 saves the bare state_dict)
        from flax import serialization
        opt_state = serialization.from_state_dict(
            opt_state, resume_extra["opt_state"])
    if mesh is not None:
        params = shard_params(mesh, params)
        opt_state = shard_params(mesh, opt_state)

    # multi-scale training: random re-bucketed input size every 10 iters
    # (reference train.py:287-294); each size bucket gets its own cached
    # jitted step (params/opt_state are size-independent). The bucket
    # schedule is derived per (epoch) so a resumed run replays it.
    ms_sizes = multi_scale_sizes() if args.multi_scale else None
    cur_cfg = cfg
    # exact-resume alignment: shuffle order + per-item augmentation
    # seeds are pure functions of (loader seed, epoch)
    loader.set_epoch(args.start_epoch)
    steps_by_size = {cfg.input_size: step}

    def step_for(c):
        if c.input_size not in steps_by_size:
            steps_by_size[c.input_size] = make_train_step(
                det.module, c, tc, mesh=mesh)[1]
        return steps_by_size[c.input_size]

    from yolo_tpu.utils.profiling import MetricsLogger
    metrics_log = MetricsLogger(
        os.path.join(save_dir, "metrics.jsonl"), echo=False)

    epoch_size = max(len(loader), 1)
    best_map = -1.0
    for epoch in range(args.start_epoch, args.max_epoch):
        t_epoch = time.time()
        ms_rng = np.random.default_rng((7, epoch))

        it_counter = itertools.count()

        def prepare(arg, epoch=epoch, ms_rng=ms_rng):
            """Per-iteration host work, run in the prefetch producer
            thread so GT assignment + the (async) host->device transfer
            of batch n+1 overlap the device computing batch n. (Called
            strictly in order by the single producer thread, so the
            iteration counter and ms state are race-free.)"""
            nonlocal cur_cfg
            it = next(it_counter)
            images, targets = arg
            if ms_sizes and it % 10 == 0:
                size = ms_sizes[int(ms_rng.integers(len(ms_sizes)))]
                cur_cfg = cfg.with_input_size(size)
            step_fn = step
            if ms_sizes:
                images = _resize_batch(images, cur_cfg.input_size)
                step_fn = step_for(cur_cfg)
            lr = lr_at(tc, epoch, it, epoch_size)
            gt = build_targets(cur_cfg, targets)
            if mesh is not None:
                images = shard(mesh, images)
                gt = shard(mesh, gt)
            else:
                images = jax.device_put(images)
                gt = jax.device_put(gt)
            return it, step_fn, lr, images, gt

        # pass the epoch generator itself: if the loop exits early
        # (--debug, exception), prefetch_iter closes it so the loader's
        # worker pool shuts down instead of leaking
        for it, step_fn, lr, images, gt in prefetch_iter(
                iter(loader), prepare, depth=2):
            params, opt_state, metrics = step_fn(params, opt_state,
                                                 images, gt, lr)
            if it % 10 == 0:
                m = jax.device_get(metrics)
                print(f"[Epoch {epoch}][Iter {it}/{epoch_size}]"
                      f"[lr {lr:.6f}] obj {float(m['conf_loss']):.2f} | "
                      f"cls {float(m['cls_loss']):.2f} | "
                      f"box {float(m['txtytwth_loss']):.2f} | "
                      f"total {float(m['total_loss']):.2f}")
                metrics_log.log(
                    epoch * epoch_size + it, lr=lr,
                    conf_loss=float(m["conf_loss"]),
                    cls_loss=float(m["cls_loss"]),
                    txtytwth_loss=float(m["txtytwth_loss"]),
                    total_loss=float(m["total_loss"]))
            if args.debug:
                break

        print(f"epoch {epoch} took {time.time() - t_epoch:.1f}s")

        if (epoch + 1) % args.eval_epoch == 0:
            # Multi-host: params are replicated on the global mesh, so
            # process 0 pulls a host-local copy (no collective) and
            # evaluates with a plain local jit while the other hosts
            # keep dispatching — a DCN job is no longer blind
            # (reference train.py:343-354 evaluates periodically).
            eval_params = (distributed.replicated_to_host(params)
                           if multihost else params)
            if jax.process_index() == 0:
                mean_ap = evaluator.evaluate(
                    lambda imgs: det.detect(eval_params, imgs))
                print(f"[Epoch {epoch}] mAP = {mean_ap:.4f}")
                metrics_log.log((epoch + 1) * epoch_size, mAP=mean_ap)
                if mean_ap > best_map:
                    best_map = mean_ap
        if ((epoch + 1) % 10 == 0 or epoch + 1 == args.max_epoch) and \
                jax.process_index() == 0:
            from flax import serialization
            path = os.path.join(
                save_dir, f"{args.version}_{epoch + 1}.msgpack")
            save_checkpoint(path, params, extra={
                "epoch": epoch + 1,
                "opt_state": serialization.to_state_dict(
                    jax.device_get(opt_state)),
            })
            print(f"saved {path}")
        if args.debug:
            break
    metrics_log.close()
    return params


if __name__ == "__main__":
    train()
