"""Checkpoint tests: msgpack round-trip + reference .pth import."""

import jax
import numpy as np
import pytest
import torch
import torch.nn as nn

from yolo_tpu.config import get_config
from yolo_tpu.models import slim_yolo_v2
from yolo_tpu.utils.checkpoint import (
    load_checkpoint, load_torch_slim_yolo_v2, save_checkpoint)


def test_msgpack_roundtrip(tmp_path):
    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt.msgpack")
    save_checkpoint(path, params, extra={"epoch": 3})
    loaded, extra = load_checkpoint(path)
    assert extra["epoch"] == 3
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class _RefConvBlock(nn.Module):
    """Reference-layout Conv2d block (utils/modules.py:6-29)."""

    def __init__(self, cin, cout, bn=True):
        super().__init__()
        layers = [nn.Conv2d(cin, cout, 3, padding=1, bias=not bn)]
        if bn:
            layers.append(nn.BatchNorm2d(cout))
        layers.append(nn.LeakyReLU(0.125))
        self.convs = nn.Sequential(*layers)


class _RefSlim(nn.Module):
    """Key-layout replica of the reference SlimYOLOv2 state_dict
    (models/slim_yolo_v2.py:385-422) for loader testing."""

    def __init__(self, num_anchors=5, num_classes=2, bn=True):
        super().__init__()
        chans = [(3, 16), (16, 32), (32, 64), (64, 64), (64, 128),
                 (128, 128), (128, 256), (256, 256), (256, 256)]
        names = ["conv1", "conv2", "conv3_1", "conv3_2", "conv4_1",
                 "conv4_2", "conv5", "conv6", "conv7"]
        for name, (ci, co) in zip(names, chans):
            setattr(self, name, _RefConvBlock(ci, co, bn))
        self.pred = nn.Conv2d(256, num_anchors * (5 + num_classes), 3,
                              padding=1)


def test_load_torch_slim_yolo_v2(tmp_path):
    """A reference-layout .pth loads, transposes, and produces the same
    conv outputs through our forward as through torch."""
    torch.manual_seed(0)
    ref = _RefSlim(bn=True)
    # randomize BN running stats so folding is non-trivial
    for mod in ref.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_()
            mod.running_var.uniform_(0.5, 1.5)
    path = str(tmp_path / "slim.pth")
    torch.save(ref.state_dict(), path)

    params, trackers = load_torch_slim_yolo_v2(path, fused=False)
    assert trackers == {}
    assert params["conv1"]["w"].shape == (3, 3, 3, 16)
    assert "bn" in params["conv1"]
    assert params["pred"]["w"].shape == (3, 3, 256, 35)

    # forward parity on a small input
    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    rng = np.random.default_rng(0)
    x = rng.random((1, 32, 32, 3), dtype=np.float32)
    ours = np.asarray(slim_yolo_v2.forward(params, x, cfg)[0])

    ref.eval()
    import torch.nn.functional as F
    with torch.no_grad():
        t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        for name in ["conv1", None, "conv2", None, "conv3_1", "conv3_2",
                     None, "conv4_1", "conv4_2", None, "conv5", "conv6",
                     "conv7"]:
            if name is None:
                t = F.max_pool2d(t, 2, 2)
            else:
                t = getattr(ref, name).convs(t)
        t = ref.pred(t)
    want = np.transpose(t.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)


def test_load_torch_fused_with_trackers(tmp_path):
    """Quantized-bnfuse layout: biased convs + tracker scale buffers."""
    torch.manual_seed(1)
    ref = _RefSlim(bn=False)
    sd = ref.state_dict()
    # add tracker buffers the way the reference registers them
    # (models/slim_yolo_v2.py:13, 58-89)
    for tk in ["a_tracker_in", "a_tracker1", "a_tracker2", "a_tracker3_1",
               "a_tracker3_2", "a_tracker4_1", "a_tracker4_2",
               "a_tracker5", "a_tracker6", "a_tracker7", "a_tracker_pred"]:
        sd[f"{tk}.scale"] = torch.tensor([32.0])
        sd[f"{tk}.first_a"] = torch.tensor([1.0])
    path = str(tmp_path / "slim_q.pth")
    torch.save(sd, path)

    params, trackers = load_torch_slim_yolo_v2(path, fused=True)
    assert "bn" not in params["conv1"]
    assert "b" in params["conv1"]
    assert trackers["in"] == 32.0 and trackers["conv3_1"] == 32.0
    assert len(trackers) == 11


def test_orbax_roundtrip(tmp_path):
    """Orbax directory checkpoint: host arrays round-trip with extra
    metadata."""
    from yolo_tpu.utils.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax)

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint_orbax(path, jax.device_get(params),
                          extra={"epoch": 7})
    loaded, extra = load_checkpoint_orbax(path)
    assert extra["epoch"] == 7
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_sharded_save_restore(tmp_path):
    """Sharded jax.Arrays (8-device mesh) save and restore; restored
    values equal the original."""
    from yolo_tpu.parallel.mesh import make_mesh, shard_params
    from yolo_tpu.utils.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax)

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(1), cfg)
    mesh = make_mesh(data=8)
    sharded = shard_params(mesh, params)
    path = str(tmp_path / "ckpt_orbax_sh")
    save_checkpoint_orbax(path, sharded)
    loaded, _ = load_checkpoint_orbax(path)
    for x, y in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
