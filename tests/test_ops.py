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


# ---------------------------------------------------------------------------
# conv_block_pool_s2d: pooled-resolution space-to-depth form of
# conv3x3(s1,p1)+BN+LeakyReLU+maxpool2x2 — must match the plain form.
# ---------------------------------------------------------------------------


def _bn_params(rng, c_in, c_out):
    key = jax.random.PRNGKey(int(rng.integers(1 << 30)))
    p = blocks.init_conv_block(key, 3, c_in, c_out, batch_norm=True)
    # non-trivial running stats / affine so the BN path is exercised
    p["bn"]["gamma"] = jnp.asarray(
        rng.standard_normal(c_out, dtype=np.float32) + 1.5)
    p["bn"]["beta"] = jnp.asarray(
        rng.standard_normal(c_out, dtype=np.float32))
    p["bn"]["mean"] = jnp.asarray(
        rng.standard_normal(c_out, dtype=np.float32))
    p["bn"]["var"] = jnp.asarray(
        rng.random(c_out, dtype=np.float32) + 0.5)
    return p


def test_conv_block_pool_s2d_eval_bn(rng):
    p = _bn_params(rng, 3, 16)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 3), dtype=np.float32))
    want = blocks.max_pool(blocks.conv_block(p, x, padding=1), 2, 2)
    got = blocks.conv_block_pool_s2d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_conv_block_pool_s2d_eval_fused(rng):
    key = jax.random.PRNGKey(7)
    p = blocks.init_conv(key, 3, 16, 32, bias=True)
    x = jnp.asarray(rng.standard_normal((2, 10, 10, 16), dtype=np.float32))
    want = blocks.max_pool(blocks.conv_block(p, x, padding=1), 2, 2)
    got = blocks.conv_block_pool_s2d(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_conv_block_pool_s2d_train_stats_match(rng):
    p = _bn_params(rng, 3, 8)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3), dtype=np.float32))
    y_ref, new_ref = blocks.conv_block(p, x, padding=1, train=True)
    want = blocks.max_pool(y_ref, 2, 2)
    got, new_s2d = blocks.conv_block_pool_s2d(p, x, train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    # BN running-stat updates identical: the phase axis enumerates each
    # full-resolution conv output exactly once
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(new_s2d["bn"][k]),
                                   np.asarray(new_ref["bn"][k]),
                                   rtol=1e-4, atol=1e-5)


def test_conv_block_pool_s2d_gradients_match(rng):
    p = _bn_params(rng, 3, 8)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3), dtype=np.float32))

    def loss_ref(p, x):
        y, _ = blocks.conv_block(p, x, padding=1, train=True)
        return jnp.sum(blocks.max_pool(y, 2, 2) ** 2)

    def loss_s2d(p, x):
        y, _ = blocks.conv_block_pool_s2d(p, x, train=True)
        return jnp.sum(y ** 2)

    g_ref = jax.grad(loss_ref)(p, x)
    g_s2d = jax.grad(loss_s2d)(p, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4),
        g_ref, g_s2d)


def test_conv_block_pool_dispatcher(rng):
    """Default trace is bit-identical to conv_block+max_pool; inside a
    fast_pool_context the s2d form is used for C_in <= cin_max."""
    p = _bn_params(rng, 3, 8)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32))
    plain = blocks.max_pool(blocks.conv_block(p, x, padding=1), 2, 2)
    np.testing.assert_array_equal(
        np.asarray(blocks.conv_block_pool(p, x)), np.asarray(plain))
    with blocks.fast_pool_context(cin_max=32):
        fast = blocks.conv_block_pool(p, x)
        s2d = blocks.conv_block_pool_s2d(p, x)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(s2d))
    with blocks.fast_pool_context(cin_max=2):  # C_in=3 above threshold
        off = blocks.conv_block_pool(p, x)
    np.testing.assert_array_equal(np.asarray(off), np.asarray(plain))


def test_fast_pool_slim_forward_close(rng):
    """Slim forward traced under fast_pool_context stays numerically
    close to the exact trace (same math, different summation order)."""
    from yolo_tpu.config import get_config
    from yolo_tpu.models import slim_yolo_v2 as slim

    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64))
    params = slim.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    ref = slim.forward(params, x, cfg)[0]
    with blocks.fast_pool_context(cin_max=32):
        fast = slim.forward(params, x, cfg)[0]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)
