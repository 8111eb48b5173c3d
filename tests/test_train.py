"""Training-step tests: loss decreases, LR schedule parity, multi-device
data-parallel step on the virtual 8-CPU mesh."""

import jax
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.parallel import make_mesh, shard_batch, shard_params
from yolo_tpu.train.targets import build_targets
from yolo_tpu.train.trainer import (
    TrainConfig, lr_at, make_train_step, multi_scale_sizes)


def _tiny_setup(batch=2):
    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64))
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    images = rng.random((batch, 64, 64, 3), dtype=np.float32)
    labels = [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * batch
    gt = build_targets(cfg, labels)
    return det, params, images, gt


def test_train_step_decreases_loss():
    det, params, images, gt = _tiny_setup()
    tc = TrainConfig(base_lr=1e-4)
    opt, step = make_train_step(det.module, det.cfg, tc, donate=False)
    opt_state = opt.init(params)
    losses = []
    for _ in range(10):
        params, opt_state, metrics = step(params, opt_state, images, gt,
                                          1e-4)
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_train_step_on_mesh():
    mesh = make_mesh()  # 8 virtual CPU devices on 'data'
    det, params, images, gt = _tiny_setup(batch=8)
    tc = TrainConfig()
    opt, step = make_train_step(det.module, det.cfg, tc, mesh=mesh,
                                donate=False)
    params = shard_params(mesh, params)
    opt_state = shard_params(mesh, opt.init(params))
    images = shard_batch(mesh, images)
    gt = shard_batch(mesh, gt)
    params2, opt_state, metrics = step(params, opt_state, images, gt, 1e-3)
    assert np.isfinite(float(metrics["total_loss"]))

    # data-parallel result == single-device result (same global batch)
    opt1, step1 = make_train_step(det.module, det.cfg, tc, donate=False)
    params_ref = jax.device_get(params)
    p1, _, m1 = step1(params_ref, opt1.init(params_ref),
                      jax.device_get(images), jax.device_get(gt), 1e-3)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(metrics["total_loss"]), rtol=1e-4)
    a = jax.tree_util.tree_leaves(jax.device_get(params2))
    b = jax.tree_util.tree_leaves(p1)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-3, atol=1e-5)


def test_remat_matches_plain_step():
    """jax.checkpoint rematerialization changes memory, not math."""
    det, params, images, gt = _tiny_setup()
    opt_a, step_a = make_train_step(det.module, det.cfg,
                                    TrainConfig(), donate=False)
    opt_b, step_b = make_train_step(det.module, det.cfg,
                                    TrainConfig(remat=True), donate=False)
    pa, _, ma = step_a(params, opt_a.init(params), images, gt, 1e-3)
    pb, _, mb = step_b(params, opt_b.init(params), images, gt, 1e-3)
    np.testing.assert_allclose(float(ma["total_loss"]),
                               float(mb["total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_lr_schedule_matches_reference_semantics():
    tc = TrainConfig(base_lr=1e-3, wp_epoch=2, lr_epoch=(150, 200),
                     max_epoch=260)
    epoch_size = 100
    # quartic warmup (reference train.py:273-281)
    assert lr_at(tc, 0, 0, epoch_size) == 0.0
    np.testing.assert_allclose(
        lr_at(tc, 1, 50, epoch_size), 1e-3 * (150 / 200) ** 4)
    # steps at 150 / 200 (reference train.py:255-263)
    assert lr_at(tc, 100, 0, epoch_size) == 1e-3
    np.testing.assert_allclose(lr_at(tc, 150, 0, epoch_size), 1e-4)
    np.testing.assert_allclose(lr_at(tc, 210, 0, epoch_size), 1e-5)
    # cosine (applies after warmup; reference train.py:264-268)
    tcc = TrainConfig(cos=True)
    import math
    want = 0.00001 + 0.5 * (1e-3 - 0.00001) * (1 + math.cos(
        math.pi * 10 / 260))
    np.testing.assert_allclose(lr_at(tcc, 10, 0, epoch_size), want)


def test_multi_scale_sizes():
    sizes = multi_scale_sizes()
    assert sizes[0] == (320, 320) and sizes[-1] == (608, 608)
    assert all(h % 32 == 0 for h, _ in sizes)


def test_resize_batch_stays_on_device(rng):
    """-ms bucket resize returns a device array (no host round-trip per
    iteration) with jax.image.resize values."""
    import jax

    from yolo_tpu.cli.train import _resize_batch

    imgs = rng.random((2, 16, 16, 3)).astype(np.float32)
    out = _resize_batch(imgs, (32, 32))
    assert isinstance(out, jax.Array)
    want = jax.image.resize(imgs, (2, 32, 32, 3), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6)
    # same-size batches pass through untouched
    assert _resize_batch(imgs, (16, 16)) is imgs


def test_bf16_mixed_precision_step(rng):
    """bf16 compute with fp32 master params: loss close to the fp32
    step's, params stay fp32, training still descends."""
    import jax

    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.train.targets import build_targets
    from yolo_tpu.train.trainer import TrainConfig, make_train_step

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    images = rng.random((2, 32, 32, 3), dtype=np.float32)
    gt = build_targets(cfg, [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * 2)

    tc32 = TrainConfig()
    tc16 = TrainConfig(compute_dtype="bfloat16")
    opt32, step32 = make_train_step(det.module, cfg, tc32, donate=False)
    opt16, step16 = make_train_step(det.module, cfg, tc16, donate=False)

    p32, o32 = params, opt32.init(params)
    p16, o16 = params, opt16.init(params)
    losses16 = []
    for i in range(5):
        p32, o32, m32 = step32(p32, o32, images, gt, 1e-4)
        p16, o16, m16 = step16(p16, o16, images, gt, 1e-4)
        losses16.append(float(m16["total_loss"]))
        # bf16 loss tracks the fp32 loss
        assert abs(float(m32["total_loss"]) - losses16[-1]) < \
            0.10 * max(1.0, float(m32["total_loss"]))
    # master params remain fp32
    leaf = jax.tree_util.tree_leaves(p16)[0]
    assert leaf.dtype == np.float32
    assert losses16[-1] < losses16[0]


def test_bf16_preserves_fp32_masters(rng):
    """The bf16 step must never round master weights through bf16: with
    lr=0 (and wd folded to a zero update by the lr) every non-BN-stat
    leaf must come back BIT-IDENTICAL, and sub-bf16-ulp perturbations
    must survive the step (ADVICE r2 high: trainer.py master-weight
    re-rounding)."""
    import jax
    import jax.numpy as jnp

    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.train.targets import build_targets
    from yolo_tpu.train.trainer import TrainConfig, make_train_step

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    # add a perturbation far below the bf16 ulp of each weight: a cast
    # through bf16 would erase it
    params = jax.tree_util.tree_map(
        lambda p: p + jnp.float32(1e-7) * (jnp.abs(p) + 1e-3), params)
    images = rng.random((2, 32, 32, 3), dtype=np.float32)
    gt = build_targets(cfg, [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * 2)

    tc = TrainConfig(compute_dtype="bfloat16", weight_decay=0.0)
    opt, step = make_train_step(det.module, cfg, tc, donate=False)
    p1, _, _ = step(params, opt.init(params), images, gt, 0.0)

    flat0 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    for (path, a), (_, b) in zip(flat0, flat1):
        keys = [getattr(k, "key", None) for k in path]
        if "bn" in keys and keys[-1] in ("mean", "var"):
            continue  # running stats legitimately update in the forward
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"master weight re-rounded at {keys}")


def test_uint8_step_matches_host_normalized():
    """A uint8 batch (in-graph normalize, detector.normalize_u8) yields
    the same loss/updates as host-normalizing the same bytes — the 4x
    transfer saving costs nothing numerically."""
    from yolo_tpu.config import BGR_MEAN, BGR_STD

    det, params, _, gt = _tiny_setup()
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)  # RGB
    mean = np.asarray(BGR_MEAN[::-1], np.float32)
    std = np.asarray(BGR_STD[::-1], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std

    tc = TrainConfig(base_lr=1e-4)
    opt, step = make_train_step(det.module, det.cfg, tc, donate=False)
    opt_state = opt.init(params)
    p_u8, _, m_u8 = step(params, opt_state, u8, gt, 1e-4)
    p_f32, _, m_f32 = step(params, opt_state, f32, gt, 1e-4)
    np.testing.assert_allclose(float(m_u8["total_loss"]),
                               float(m_f32["total_loss"]),
                               rtol=1e-6, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_u8),
                    jax.tree_util.tree_leaves(p_f32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_uint8_detect_matches_normalized():
    """Detector.detect on raw uint8 == detect on the host-normalized
    float of the same bytes."""
    from yolo_tpu.config import BGR_MEAN, BGR_STD

    det, params, _, _ = _tiny_setup()
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    mean = np.asarray(BGR_MEAN[::-1], np.float32)
    std = np.asarray(BGR_STD[::-1], np.float32)
    f32 = (u8.astype(np.float32) / 255.0 - mean) / std
    out_u8 = det.detect(params, u8)
    out_f32 = det.detect(params, f32)
    for a, b in zip(out_u8, out_f32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_checkpoint_resume_is_bit_exact(tmp_path):
    """Save -> restart -> continue reproduces an uninterrupted run
    EXACTLY: the loader's shuffle order and per-item augmentation seeds
    are pure functions of (seed, epoch) (BatchLoader.set_epoch), and
    checkpoints carry optimizer momentum — so 1 epoch + resume + 1
    epoch equals 2 straight epochs, parameter-for-parameter."""
    from flax import serialization

    from yolo_tpu.config import get_config
    from yolo_tpu.data.loader import BatchLoader
    from yolo_tpu.data.synthetic import SyntheticDetection
    from yolo_tpu.data.transforms import SSDAugmentation
    from yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    det = Detector(cfg)
    tc = TrainConfig(base_lr=1e-3)

    def make_loader():
        ds = SyntheticDetection(size=(32, 32), num_classes=2, length=8,
                                transform=SSDAugmentation((32, 32)))
        return BatchLoader(ds, 4, num_workers=2, seed=11)

    def run_epoch(loader, epoch, params, opt_state, step):
        loader.set_epoch(epoch)
        for images, targets in loader:
            gt = build_targets(cfg, targets)
            params, opt_state, _ = step(params, opt_state, images, gt,
                                        1e-3)
        return params, opt_state

    # straight: two epochs in one process
    params = det.init_params(jax.random.PRNGKey(0))
    opt, step = make_train_step(det.module, cfg, tc, donate=False)
    opt_state = opt.init(params)
    p, o = run_epoch(make_loader(), 0, params, opt_state, step)
    p, o = run_epoch(make_loader(), 1, p, o, step)
    want = jax.device_get(p)

    # interrupted: epoch 0, checkpoint, "restart" (fresh loader/opt
    # objects, state from disk), epoch 1
    params = det.init_params(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    p1, o1 = run_epoch(make_loader(), 0, params, opt_state, step)
    ckpt = tmp_path / "resume.msgpack"
    save_checkpoint(str(ckpt), p1, extra={
        "epoch": 1,
        "opt_state": serialization.to_state_dict(jax.device_get(o1)),
    })
    p2, extra = load_checkpoint(str(ckpt))
    o2 = serialization.from_state_dict(opt.init(p2),
                                       extra["opt_state"])
    p2, _ = run_epoch(make_loader(), int(extra["epoch"]), p2, o2, step)
    got = jax.device_get(p2)

    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fast_pool_step_matches_plain_step():
    """fast_pool_cin changes summation order, not the math: one step's
    loss and updated params stay numerically close to the exact trace."""
    det, params, images, gt = _tiny_setup()
    opt_a, step_a = make_train_step(det.module, det.cfg,
                                    TrainConfig(), donate=False)
    opt_b, step_b = make_train_step(det.module, det.cfg,
                                    TrainConfig(fast_pool_cin=32),
                                    donate=False)
    pa, _, ma = step_a(params, opt_a.init(params), images, gt, 1e-3)
    pb, _, mb = step_b(params, opt_b.init(params), images, gt, 1e-3)
    np.testing.assert_allclose(float(ma["total_loss"]),
                               float(mb["total_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
