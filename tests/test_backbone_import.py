"""Layout-replica import tests for the darknet19/53/light .pth loaders
(VERDICT r1 weak #4): build torch modules with the reference state_dict
key layout (backbone/darknet.py), save, import, and assert forward
parity torch-vs-ours on the imported weights."""

import jax
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from yolo_tpu.models import darknet
from yolo_tpu.utils.checkpoint import (
    load_torch_darknet19, load_torch_darknet53, load_torch_darknet_light)


class _CBL(nn.Module):
    """Reference Conv_BN_LeakyReLU (backbone/darknet.py:12-22)."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.convs = nn.Sequential(
            nn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                      bias=False),
            nn.BatchNorm2d(cout),
            nn.LeakyReLU(0.1, inplace=True),
        )

    def forward(self, x):
        return self.convs(x)


def _randomize_bn(mod):
    for m in mod.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_()
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.normal_()


def _ours_vs_torch(ours, t):
    want = np.transpose(t.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-3,
                               atol=1e-4)


class _RefD19(nn.Module):
    """Key-layout replica of reference DarkNet_19
    (backbone/darknet.py:40-108)."""

    def __init__(self):
        super().__init__()
        self.conv_1 = nn.Sequential(_CBL(3, 32, 3, padding=1))
        self.conv_2 = nn.Sequential(_CBL(32, 64, 3, padding=1))
        self.conv_3 = nn.Sequential(
            _CBL(64, 128, 3, padding=1), _CBL(128, 64, 1),
            _CBL(64, 128, 3, padding=1))
        self.conv_4 = nn.Sequential(
            _CBL(128, 256, 3, padding=1), _CBL(256, 128, 1),
            _CBL(128, 256, 3, padding=1))
        self.conv_5 = nn.Sequential(
            _CBL(256, 512, 3, padding=1), _CBL(512, 256, 1),
            _CBL(256, 512, 3, padding=1), _CBL(512, 256, 1),
            _CBL(256, 512, 3, padding=1))
        self.conv_6 = nn.Sequential(
            _CBL(512, 1024, 3, padding=1), _CBL(1024, 512, 1),
            _CBL(512, 1024, 3, padding=1), _CBL(1024, 512, 1),
            _CBL(512, 1024, 3, padding=1))

    def forward(self, x):
        x = F.max_pool2d(self.conv_1(x), 2)
        x = F.max_pool2d(self.conv_2(x), 2)
        x = F.max_pool2d(self.conv_3(x), 2)
        c4 = self.conv_4(x)
        c5 = self.conv_5(F.max_pool2d(c4, 2))
        c6 = self.conv_6(F.max_pool2d(c5, 2))
        return c4, c5, c6


def test_darknet19_import_forward_parity(tmp_path):
    torch.manual_seed(0)
    ref = _RefD19()
    _randomize_bn(ref)
    path = str(tmp_path / "darknet19.pth")
    torch.save(ref.state_dict(), path)

    params = load_torch_darknet19(path)
    assert params["conv_3"][1]["w"].shape == (1, 1, 128, 64)

    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    (c4, c5, c6), _ = darknet.darknet19(params, x)
    ref.eval()
    with torch.no_grad():
        t4, t5, t6 = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    _ours_vs_torch(c4, t4)
    _ours_vs_torch(c5, t5)
    _ours_vs_torch(c6, t6)


class _RefResblock(nn.Module):
    """Reference resblock (backbone/darknet.py:24-38)."""

    def __init__(self, ch, nblocks):
        super().__init__()
        self.module_list = nn.ModuleList()
        for _ in range(nblocks):
            self.module_list.append(nn.Sequential(
                _CBL(ch, ch // 2, 1),
                _CBL(ch // 2, ch, 3, padding=1)))

    def forward(self, x):
        for block in self.module_list:
            x = x + block(x)
        return x


class _RefD53(nn.Module):
    """Key-layout replica of reference DarkNet_53
    (backbone/darknet.py:110-159)."""

    def __init__(self):
        super().__init__()
        self.layer_1 = nn.Sequential(
            _CBL(3, 32, 3, padding=1),
            _CBL(32, 64, 3, stride=2, padding=1),
            _RefResblock(64, 1))
        self.layer_2 = nn.Sequential(
            _CBL(64, 128, 3, stride=2, padding=1), _RefResblock(128, 2))
        self.layer_3 = nn.Sequential(
            _CBL(128, 256, 3, stride=2, padding=1), _RefResblock(256, 8))
        self.layer_4 = nn.Sequential(
            _CBL(256, 512, 3, stride=2, padding=1), _RefResblock(512, 8))
        self.layer_5 = nn.Sequential(
            _CBL(512, 1024, 3, stride=2, padding=1), _RefResblock(1024, 4))

    def forward(self, x):
        x = self.layer_1(x)
        x = self.layer_2(x)
        c3 = self.layer_3(x)
        c4 = self.layer_4(c3)
        c5 = self.layer_5(c4)
        return c3, c4, c5


def test_darknet53_import_forward_parity(tmp_path):
    torch.manual_seed(1)
    ref = _RefD53()
    _randomize_bn(ref)
    path = str(tmp_path / "darknet53.pth")
    torch.save(ref.state_dict(), path)

    params = load_torch_darknet53(path)
    assert params["layer_1"]["entry"][0]["w"].shape == (3, 3, 3, 32)
    assert len(params["layer_3"]["blocks"]) == 8

    rng = np.random.default_rng(1)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    (c3, c4, c5), _ = darknet.darknet53(params, x)
    ref.eval()
    with torch.no_grad():
        t3, t4, t5 = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    _ours_vs_torch(c3, t3)
    _ours_vs_torch(c4, t4)
    _ours_vs_torch(c5, t5)


class _RefDLight(nn.Module):
    """Key-layout replica of reference DarkNet_Light
    (backbone/darknet.py:211-255)."""

    def __init__(self):
        super().__init__()
        self.conv_1 = _CBL(3, 16, 3, padding=1)
        self.conv_2 = _CBL(16, 32, 3, padding=1)
        self.conv_3 = _CBL(32, 64, 3, padding=1)
        self.conv_4 = _CBL(64, 128, 3, padding=1)
        self.conv_5 = _CBL(128, 256, 3, padding=1)
        self.conv_6 = _CBL(256, 512, 3, padding=1)
        self.conv_7 = _CBL(512, 1024, 3, padding=1)

    def forward(self, x):
        x = F.max_pool2d(self.conv_1(x), 2)
        x = F.max_pool2d(self.conv_2(x), 2)
        x = F.max_pool2d(self.conv_3(x), 2)
        x = F.max_pool2d(self.conv_4(x), 2)
        c4 = self.conv_5(x)
        x = F.max_pool2d(c4, 2)
        x = self.conv_6(x)
        # ZeroPad2d((0,1,0,1)) + stride-1 maxpool (darknet.py:232-235)
        x = F.max_pool2d(F.pad(x, (0, 1, 0, 1)), 2, stride=1)
        c5 = self.conv_7(x)
        return c4, c5


def test_darknet_light_import_forward_parity(tmp_path):
    torch.manual_seed(2)
    ref = _RefDLight()
    _randomize_bn(ref)
    path = str(tmp_path / "darknet_light.pth")
    torch.save(ref.state_dict(), path)

    params = load_torch_darknet_light(path)
    assert params["conv_7"][0]["w"].shape == (3, 3, 512, 1024)

    rng = np.random.default_rng(2)
    x = rng.random((1, 64, 64, 3), dtype=np.float32)
    (c4, c5), _ = darknet.darknet_light(params, x)
    ref.eval()
    with torch.no_grad():
        t4, t5 = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    _ours_vs_torch(c4, t4)
    _ours_vs_torch(c5, t5)


def test_pretrained_backbone_dispatch(tmp_path):
    """cli.train.load_pretrained_backbone picks the right importer and
    grafts a backbone pytree that our models can run."""
    from yolo_tpu.cli.train import load_pretrained_backbone

    torch.manual_seed(3)
    ref = _RefDLight()
    path = str(tmp_path / "dl.pth")
    torch.save(ref.state_dict(), path)
    params = load_pretrained_backbone("tiny_yolo_v3", path)
    assert set(params) == {f"conv_{i}" for i in range(1, 8)}

    import pytest
    with pytest.raises(ValueError):
        load_pretrained_backbone("slim_yolo_v2", path)
