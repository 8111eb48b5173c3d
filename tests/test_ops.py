"""Op-level parity tests against torch oracles (torch is test-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from yolo_tpu.ops import blocks


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 5), dtype=np.float32)
    w = rng.standard_normal((3, 3, 5, 7), dtype=np.float32)
    b = rng.standard_normal(7, dtype=np.float32)
    got = np.asarray(blocks.conv2d(jnp.asarray(x), jnp.asarray(w),
                                   jnp.asarray(b), padding=1))
    # torch: OIHW from HWIO
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    want = _to_nhwc(F.conv2d(_nchw(x), wt, torch.from_numpy(b), padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_leaky_relu_slope():
    x = jnp.asarray([-8.0, -1.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(blocks.leaky_relu(x)), [-1.0, -0.125, 0.0, 3.0])


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 8, 10, 3), dtype=np.float32)
    got = np.asarray(blocks.max_pool(jnp.asarray(x), 2, 2))
    want = _to_nhwc(F.max_pool2d(_nchw(x), 2, 2))
    np.testing.assert_allclose(got, want)


def test_reorg_matches_torch(rng):
    """The passthrough layer's channel ordering must match the reference
    implementation (utils/modules.py:43-57) exactly — weight loading for
    yolo_v2 depends on it."""
    x = rng.standard_normal((2, 4, 6, 3), dtype=np.float32)
    got = np.asarray(blocks.reorg(jnp.asarray(x), 2))

    # torch oracle: the reference's exact view/transpose chain.
    t = _nchw(x)
    bs, c, h, w = t.size()
    s = 2
    _h, _w = h // s, w // s
    t = t.view(bs, c, _h, s, _w, s).transpose(3, 4).contiguous()
    t = t.view(bs, c, _h * _w, s * s).transpose(2, 3).contiguous()
    t = t.view(bs, c, s * s, _h, _w).transpose(1, 2).contiguous()
    t = t.view(bs, -1, _h, _w)
    np.testing.assert_allclose(got, _to_nhwc(t))


def test_spp_matches_torch(rng):
    x = rng.standard_normal((1, 13, 13, 4), dtype=np.float32)
    got = np.asarray(blocks.spp(jnp.asarray(x)))
    t = _nchw(x)
    want = torch.cat([
        t,
        F.max_pool2d(t, 5, stride=1, padding=2),
        F.max_pool2d(t, 9, stride=1, padding=4),
        F.max_pool2d(t, 13, stride=1, padding=6),
    ], dim=1)
    np.testing.assert_allclose(got, _to_nhwc(want))


def test_upsample_align_corners_matches_torch(rng):
    x = rng.standard_normal((1, 5, 7, 3), dtype=np.float32)
    got = np.asarray(blocks.upsample2x_align_corners(jnp.asarray(x)))
    want = _to_nhwc(F.interpolate(_nchw(x), scale_factor=2.0,
                                  mode="bilinear", align_corners=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_zero_pad_maxpool_s1_matches_torch(rng):
    x = rng.standard_normal((1, 6, 6, 2), dtype=np.float32)
    got = np.asarray(blocks.zero_pad_maxpool_s1(jnp.asarray(x)))
    t = F.pad(_nchw(x), (0, 1, 0, 1))
    want = _to_nhwc(F.max_pool2d(t, 2, 1))
    np.testing.assert_allclose(got, want)


def test_batch_norm_inference_matches_torch(rng):
    x = rng.standard_normal((2, 4, 4, 6), dtype=np.float32)
    bn = {
        "gamma": jnp.asarray(rng.standard_normal(6, dtype=np.float32)),
        "beta": jnp.asarray(rng.standard_normal(6, dtype=np.float32)),
        "mean": jnp.asarray(rng.standard_normal(6, dtype=np.float32)),
        "var": jnp.asarray(
            rng.random(6, dtype=np.float32) + 0.5),
    }
    got = np.asarray(blocks.batch_norm_inference(jnp.asarray(x), bn))
    m = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(np.asarray(bn["gamma"])))
        m.bias.copy_(torch.from_numpy(np.asarray(bn["beta"])))
        m.running_mean.copy_(torch.from_numpy(np.asarray(bn["mean"])))
        m.running_var.copy_(torch.from_numpy(np.asarray(bn["var"])))
        want = _to_nhwc(m(_nchw(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_batch_norm_train_updates_running_stats(rng):
    x = rng.standard_normal((4, 3, 3, 2), dtype=np.float32) * 3 + 1
    bn = {"gamma": jnp.ones(2), "beta": jnp.zeros(2),
          "mean": jnp.zeros(2), "var": jnp.ones(2)}
    y, new_bn = blocks.batch_norm_train(jnp.asarray(x), bn)
    # normalized output: ~zero mean, unit var
    np.testing.assert_allclose(np.asarray(y).mean(), 0.0, atol=1e-5)
    m = torch.nn.BatchNorm2d(2, momentum=0.1)
    want = _to_nhwc(m(_nchw(x)))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_bn["mean"]),
                               m.running_mean.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_bn["var"]),
                               m.running_var.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
