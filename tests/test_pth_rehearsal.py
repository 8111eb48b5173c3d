"""Day-one rehearsal for REAL published checkpoints (VERDICT r2 next #3):
torch.save a key-layout replica of the reference's SlimYOLOv2 /
SlimYOLOv2_quantize_bnfuse modules (models/slim_yolo_v2.py:385-422 /
40-89) and drive the resulting .pth through the SAME code paths the day
real weights appear — the eval CLI (reference eval.py:111-130) and the
INT8 visual test CLI (reference test.py:165-172) — asserting torch-vs-
ours forward parity on the imported weights, not just loader success.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from yolo_tpu.config import get_config
from yolo_tpu.models import slim_yolo_v2
from yolo_tpu.utils.checkpoint import load_torch_slim_yolo_v2

# our DetectorConfig for the mask dataset (what -d synthetic uses)
CFG = get_config("slim_yolo_v2", "mask", input_size=(64, 64))
PRED_OUT = CFG.anchors_per_scale * (1 + 4 + CFG.num_classes)


class _RefConv(nn.Module):
    """Reference utils/modules.py Conv2d: conv(bias)+BN+LeakyReLU(0.125)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.convs = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1),
            nn.BatchNorm2d(cout),
            nn.LeakyReLU(0.125, inplace=True))

    def forward(self, x):
        return self.convs(x)


class _RefConvFuse(nn.Module):
    """Reference Conv2d_fuse: biased conv + LeakyReLU(0.125), no BN."""

    def __init__(self, cin, cout):
        super().__init__()
        self.convs = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1),
            nn.LeakyReLU(0.125, inplace=True))

    def forward(self, x):
        return self.convs(x)


class _RefTracker(nn.Module):
    """AveragedRangeTracker state layout (slim_yolo_v2.py:9-15)."""

    def __init__(self, scale=64.0):
        super().__init__()
        self.register_buffer("scale", torch.tensor([scale]))
        self.register_buffer("first_a", torch.ones(1))


def _backbone_layers(mod, fuse: bool):
    Conv = _RefConvFuse if fuse else _RefConv
    for name, cin, cout, _ in slim_yolo_v2.CONV_LAYERS:
        setattr(mod, name, Conv(cin, cout))
    mod.pred = nn.Conv2d(256, PRED_OUT, 3, padding=1)


def _ref_forward(mod, x):
    out = x
    for name, _, _, pool in slim_yolo_v2.CONV_LAYERS:
        out = getattr(mod, name)(out)
        if pool:
            out = F.max_pool2d(out, 2)
    return mod.pred(out)


class _RefSlim(nn.Module):
    def __init__(self):
        super().__init__()
        _backbone_layers(self, fuse=False)

    forward = _ref_forward


class _RefSlimFuse(nn.Module):
    """SlimYOLOv2_quantize_bnfuse key layout: Conv2d_fuse blocks +
    a_tracker_* buffers (slim_yolo_v2.py:58-89)."""

    def __init__(self):
        super().__init__()
        self.a_tracker_in = _RefTracker(16.0)
        _backbone_layers(self, fuse=True)
        for name, _, _, _ in slim_yolo_v2.CONV_LAYERS:
            setattr(self, f"a_tracker{name[4:]}", _RefTracker(32.0))
        self.a_tracker_pred = _RefTracker(8.0)

    forward = _ref_forward


def _randomize(mod, seed):
    g = torch.Generator().manual_seed(seed)
    for p in mod.parameters():
        p.data.uniform_(-0.1, 0.1, generator=g)
    for m in mod.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(generator=g)
            m.running_var.uniform_(0.5, 1.5, generator=g)


@pytest.mark.parametrize("fused", [False, True])
def test_torch_saved_pth_forward_parity(tmp_path, fused):
    """torch.save'd replica .pth -> our importer -> head outputs match
    the torch module exactly (the reference eval.py:124-130 load path)."""
    mod = (_RefSlimFuse if fused else _RefSlim)()
    _randomize(mod, 0)
    mod.eval()
    path = str(tmp_path / "slim.pth")
    torch.save(mod.state_dict(), path)

    params, trackers = load_torch_slim_yolo_v2(path, fused=fused)
    if fused:
        assert trackers["in"] == pytest.approx(16.0)
        assert trackers["pred"] == pytest.approx(8.0)
        assert trackers["conv3_1"] == pytest.approx(32.0)

    x = np.random.default_rng(1).random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = mod(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(slim_yolo_v2.forward(params, x, CFG)[0])
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)


def test_eval_cli_on_torch_pth(tmp_path, capsys):
    """cli/eval.py --trained_model <torch .pth> runs end-to-end (load ->
    batched detect -> mAP + artifacts) on the synthetic dataset."""
    from yolo_tpu.cli.eval import evaluate, parse_args

    mod = _RefSlim()
    _randomize(mod, 2)
    path = str(tmp_path / "slim.pth")
    torch.save(mod.state_dict(), path)

    args = parse_args(["-v", "slim_yolo_v2", "-d", "synthetic",
                       "--input_size", "64", "64",
                       "--trained_model", path, "--batch_size", "8"])
    mean_ap = evaluate(args)
    assert 0.0 <= mean_ap <= 1.0


def test_visual_test_cli_int8_on_fused_pth(tmp_path):
    """cli/test.py -q with a torch-saved SlimYOLOv2_quantize_bnfuse .pth:
    the full reference INT8 deployment rehearsal (test.py:165-172)."""
    pytest.importorskip("cv2")
    from yolo_tpu.cli.test import parse_args, test as run_test

    mod = _RefSlimFuse()
    _randomize(mod, 3)
    path = str(tmp_path / "fused.pth")
    torch.save(mod.state_dict(), path)

    out = tmp_path / "out"
    args = parse_args(["-v", "slim_yolo_v2_q_bf", "-d", "synthetic",
                       "--input_size", "64", "64", "-q",
                       "--trained_model", path,
                       "--num_images", "2", "--output", str(out)])
    run_test(args)
    assert sorted(p.name for p in out.iterdir()) == ["0.jpg", "1.jpg"]
