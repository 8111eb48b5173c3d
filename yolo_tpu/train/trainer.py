"""Training driver: optax SGD + reference LR schedules + sharded step.

Replaces the reference train.py loop (train.py:240-361): SGD with
momentum 0.9 / weight decay 5e-4 (torch-style coupled decay), quartic
warmup, step or cosine schedule, multi-scale re-gridding by shape bucket.

The train step is a single jitted SPMD program over a ('data', 'space')
mesh: images/targets sharded on batch, params replicated, gradient psum
inserted by XLA.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from yolo_tpu import detector as det
from yolo_tpu.config import DetectorConfig, TRAIN_CFG
from yolo_tpu.train.loss import yolo_loss


@dataclass(frozen=True)
class TrainConfig:
    base_lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    wp_epoch: int = 2              # warmup epochs (reference train.py:47)
    max_epoch: int = TRAIN_CFG["max_epoch"]
    lr_epoch: Tuple[int, ...] = TRAIN_CFG["lr_epoch"]
    cos: bool = False
    obj_loss_f: str = "mse"
    # rematerialize the forward during backprop (jax.checkpoint): trades
    # ~1 extra forward of FLOPs for not storing activations in HBM —
    # enables much larger batches / resolutions per chip.
    remat: bool = False
    # mixed precision: run the conv forward/backward in this dtype while
    # params, gradients, optimizer state and the loss reduction stay
    # fp32 ('bfloat16' doubles MXU throughput on TPU; grads flow through
    # the cast back to fp32 master params)
    compute_dtype: Optional[str] = None
    # trace entry conv+pool pairs with C_in <= this threshold in the
    # pooled-resolution s2d form (blocks.conv_block_pool_s2d): same math
    # (float summation order differs), MXU-tileable instead of VPU-bound.
    # 0 = exact reference float trace.
    fast_pool_cin: int = 0


def lr_at(tc: TrainConfig, epoch: int, iteration: int,
          epoch_size: int) -> float:
    """Learning rate for (epoch, iter): quartic warmup then step/cosine
    (reference train.py:255-281)."""
    if epoch < tc.wp_epoch:
        total = iteration + epoch * epoch_size
        return tc.base_lr * math.pow(total / (tc.wp_epoch * epoch_size), 4)
    if tc.cos:
        t, T = epoch, tc.max_epoch
        return 0.00001 + 0.5 * (tc.base_lr - 0.00001) * (
            1 + math.cos(math.pi * t / T))
    lr = tc.base_lr
    for step_epoch in tc.lr_epoch:
        if epoch >= step_epoch:
            lr *= 0.1
    return lr


def make_optimizer(tc: TrainConfig):
    """SGD + momentum with torch-style (coupled) weight decay. The LR is
    injected per-step via optax.inject_hyperparams so schedules stay in
    Python like the reference loop."""
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(tc.weight_decay),
            optax.sgd(learning_rate, momentum=tc.momentum, nesterov=False),
        ))(learning_rate=tc.base_lr)
    return opt


def _cast_tree(tree, dtype, keep_bn_stats: bool = False):
    """Cast floating leaves to ``dtype``. With ``keep_bn_stats`` the BN
    running mean/var stay untouched — they are cross-step state whose EMA
    must accumulate in fp32, not compute operands."""
    def cast(path, p):
        if not jnp.issubdtype(p.dtype, jnp.floating):
            return p
        if keep_bn_stats:
            keys = [getattr(k, "key", None) for k in path]
            if "bn" in keys and keys[-1] in ("mean", "var"):
                return p
        return p.astype(dtype)
    return jax.tree_util.tree_map_with_path(cast, tree)


def _graft_bn_stats(master, new):
    """Merge ONLY the BN running-stat leaves (bn/mean, bn/var) from the
    forward's returned tree into the fp32 master tree.

    The bf16 forward returns a tree whose weight leaves are the bf16-cast
    params; grafting (instead of casting the whole tree back) keeps the
    master weights bit-identical, so sub-ulp optimizer updates accumulate
    instead of being re-rounded through bf16 every step.
    """
    def pick(path, old, newleaf):
        keys = [getattr(k, "key", None) for k in path]
        if "bn" in keys and keys[-1] in ("mean", "var"):
            return newleaf.astype(old.dtype)
        return old
    return jax.tree_util.tree_map_with_path(pick, master, new)


def loss_fn(module, cfg: DetectorConfig, tc: TrainConfig, params, images,
            gt_tensor):
    if images.dtype == jnp.uint8:
        # raw RGB bytes from SSDAugmentation(normalize=False): normalize
        # in-graph (fuses into conv1; 4x less host->device traffic)
        images = det.normalize_u8(images)
    fwd = partial(det.train_outputs, module, cfg=cfg)
    if tc.fast_pool_cin:
        base_fwd = fwd

        def fwd(params, images, _base=base_fwd):
            from yolo_tpu.ops import blocks
            with blocks.fast_pool_context(cin_max=tc.fast_pool_cin):
                return _base(params, images)
    if tc.remat:
        fwd = jax.checkpoint(fwd)
    if tc.compute_dtype:
        # bf16 compute against fp32 master params: grads of the cast are
        # the cast back, so value_and_grad still yields fp32 gradients
        cdt = jnp.dtype(tc.compute_dtype)
        outs, new_params = fwd(_cast_tree(params, cdt, keep_bn_stats=True),
                               images.astype(cdt))
        conf, cls, txt, boxes_norm = (o.astype(jnp.float32) for o in outs)
        # Only BN running stats flow back; weights stay the fp32 masters.
        new_params = _graft_bn_stats(params, new_params)
    else:
        (conf, cls, txt, boxes_norm), new_params = fwd(params, images)
    conf_l, cls_l, box_l, total = yolo_loss(
        conf, cls, txt, boxes_norm, gt_tensor, cfg.num_classes,
        obj_loss_f=tc.obj_loss_f)
    aux = {"conf_loss": conf_l, "cls_loss": cls_l, "txtytwth_loss": box_l,
           "new_params": new_params}
    return total, aux


def make_train_step(module, cfg: DetectorConfig, tc: TrainConfig,
                    mesh=None, donate: bool = True):
    """Build the jitted train step:
    (params, opt_state, images, gt, lr) -> (params, opt_state, metrics).

    With a mesh, inputs are expected batch-sharded on the 'data' axis and
    params replicated; XLA inserts the gradient all-reduce.
    """
    opt = make_optimizer(tc)

    def step(params, opt_state, images, gt_tensor, lr):
        grad_fn = jax.value_and_grad(
            partial(loss_fn, module, cfg, tc), has_aux=True)
        (total, aux), grads = grad_fn(params, images, gt_tensor)
        # BN running stats come from the forward, not the gradient.
        new_params = aux.pop("new_params")
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, new_params)
        params = optax.apply_updates(new_params, updates)
        metrics = dict(aux, total_loss=total)
        return params, opt_state, metrics

    if mesh is None:
        return opt, jax.jit(step, donate_argnums=(0, 1) if donate else ())

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    jit_step = jax.jit(
        step,
        in_shardings=(repl, repl, batch_sh, batch_sh, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
    return opt, jit_step


def multi_scale_sizes(stride_mult: int = 32, low: int = 10, high: int = 19):
    """The reference multi-scale bucket list: random size in
    [10, 19] * 32 every 10 iterations (train.py:287-294)."""
    return [(s * stride_mult, s * stride_mult) for s in range(low, high + 1)]


def train_device_resident(det, cfg: DetectorConfig, tc: TrainConfig,
                          dataset, batch: int, params,
                          seed: int = 0, verbose: bool = True):
    """Small-dataset training with the WHOLE dataset resident on device.

    The harness host has one CPU core and a ~40 MB/s tunnel to the TPU:
    a 512-image 416² epoch moves ~1 GB host->device, which dominates the
    step time ~20x over the compute. For datasets that fit in HBM (the
    synthetic parity sets: <=1 GB images + <=100 MB targets), transform
    every sample and build its target rows ONCE, upload once, and train
    by indexing on device — each step transfers only a [batch] int32
    index vector.

    Semantics match the BatchLoader path up to shuffle order (both draw
    uniform random batches of the same deterministic samples; this one
    permutes with numpy default_rng(seed)).

    Returns (params, last_metrics).
    """
    import time

    from yolo_tpu.train.targets import build_targets

    imgs, tgts = [], []
    for i in range(len(dataset)):
        img, target, _, _ = dataset.pull_item(i)
        imgs.append(np.asarray(img, np.float32))
        tgts.append(np.asarray(target).reshape(-1, 5))
    X = jnp.asarray(np.stack(imgs))
    G = jnp.asarray(np.asarray(build_targets(cfg, tgts), np.float32))

    opt, step = make_train_step(det.module, cfg, tc, donate=False)
    opt_state = opt.init(params)
    n = int(X.shape[0])
    spe = max(1, n // batch)

    # X/G are jit ARGUMENTS, not closure captures: a captured device
    # array becomes an HLO constant, and serializing a ~1 GB literal to
    # the remote compile service stalls compilation indefinitely
    @jax.jit
    def step_idx(params, opt_state, X, G, idx, lr):
        return step(params, opt_state, X[idx], G[idx], lr)

    rng = np.random.default_rng(seed)
    t0 = time.time()
    metrics = {}
    for epoch in range(tc.max_epoch):
        order = rng.permutation(n)
        for it in range(spe):
            idx = jnp.asarray(order[it * batch:(it + 1) * batch])
            lr = lr_at(tc, epoch, it, spe)
            params, opt_state, metrics = step_idx(params, opt_state,
                                                  X, G, idx, lr)
        if verbose and (epoch + 1) % 10 == 0:
            print(f"epoch {epoch + 1}: loss="
                  f"{float(metrics['total_loss']):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, metrics
