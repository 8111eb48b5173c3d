"""Pallas int8 kernel tests (interpret mode on CPU; the driver exercises
the compiled TPU path separately)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.kernels.int8_conv import (
    int8_conv3x3_im2col, int8_conv3x3_pool_requant, int8_conv3x3_requant)
from yolo_tpu.quant import fixed_point as fp


def _oracle(x, w, bq, sw, sb, sa_in, sa_out, retune, leaky, rounding,
            pool=False):
    acc = fp._conv_int_np(np.asarray(x, np.int32), np.asarray(w))
    acc = fp._shift(acc, sw + sa_in - retune, rounding, np)
    acc = acc + fp._shift(np.asarray(bq, np.int32), sb - retune, rounding,
                          np)
    acc = np.clip(acc, fp.INT16_MIN, fp.INT16_MAX)
    if leaky:
        slope = 0.125 if leaky is True else float(leaky)
        acc = fp._leaky_int_slope(acc, slope, rounding, np)
    out = np.clip(fp._shift(acc, retune - sa_out, rounding, np),
                  fp.INT8_MIN, fp.INT8_MAX)
    return fp._maxpool_int_np(out) if pool else out


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
@pytest.mark.parametrize("leaky", [True, False])
def test_kernel_bit_exact_vs_oracle(rng, rounding, leaky):
    B, H, W, Cin, Cout = 2, 8, 8, 16, 32
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, Cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, Cin, Cout)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (Cout,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=4, retune=11)
    got = np.asarray(int8_conv3x3_requant(
        x, w, bq, leaky=leaky, rounding=rounding, interpret=True, **kw))
    want = _oracle(x, w, bq, leaky=leaky, rounding=rounding, **kw)
    np.testing.assert_array_equal(got, want)


def test_kernel_negative_out_shift(rng):
    """retune < sa_out -> left output shift path."""
    B, H, W, Cin, Cout = 1, 4, 4, 8, 8
    x = jnp.asarray(rng.integers(-5, 5, (B, H, W, Cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-3, 3, (3, 3, Cin, Cout)), jnp.int8)
    bq = jnp.zeros((Cout,), jnp.int32)
    kw = dict(sw=2, sb=2, sa_in=2, sa_out=6, retune=4, leaky=True)
    got = np.asarray(int8_conv3x3_requant(x, w, bq, rounding="nearest",
                                          interpret=True, **kw))
    want = _oracle(x, w, bq, rounding="nearest", **kw)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("pool", [False, True])
@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_im2col_kernel_bit_exact(rng, pool, rounding):
    """v3 kernel: dx-packed im2col + single matmul [+ fused pool]."""
    B, H, W, Cin, Cout = 2, 8, 10, 16, 32
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, Cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, Cin, Cout)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (Cout,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=4, retune=11)
    got = np.asarray(int8_conv3x3_im2col(
        x, w, bq, leaky=True, pool=pool, rounding=rounding,
        interpret=True, **kw))
    want = _oracle(x, w, bq, leaky=True, rounding=rounding, pool=pool,
                   **kw)
    np.testing.assert_array_equal(got, want)


def test_im2col_kernel_first_conv_shape(rng):
    """Cin=3 (the conv1 shape class) with pool."""
    x = jnp.asarray(rng.integers(-128, 128, (1, 16, 12, 3)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, 3, 16)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (16,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=4, retune=11)
    got = np.asarray(int8_conv3x3_im2col(
        x, w, bq, leaky=True, pool=True, interpret=True, **kw))
    want = _oracle(x, w, bq, leaky=True, rounding="nearest", pool=True,
                   **kw)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_pooled_window_kernel_bit_exact(rng, rounding):
    """Pooled-window engine: conv+pool computed at pooled resolution via
    a 4-phase-packed matmul with in-register phase max."""
    B, H, W, Cin, Cout = 2, 8, 12, 16, 32
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, Cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, Cin, Cout)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (Cout,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=4, retune=11)
    got = np.asarray(int8_conv3x3_pool_requant(
        x, w, bq, leaky=True, rounding=rounding, interpret=True, **kw))
    want = _oracle(x, w, bq, leaky=True, rounding=rounding, pool=True,
                   **kw)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_pooled_window_kernel_s2d_assembly(rng, rounding):
    """s2d col assembly (contiguous slices) == stride2 assembly == oracle."""
    B, H, W, Cin, Cout = 2, 8, 12, 3, 16
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, Cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, Cin, Cout)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (Cout,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=4, retune=11)
    got = np.asarray(int8_conv3x3_pool_requant(
        x, w, bq, leaky=True, rounding=rounding, assembly="s2d",
        interpret=True, **kw))
    want = _oracle(x, w, bq, leaky=True, rounding=rounding, pool=True,
                   **kw)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
@pytest.mark.parametrize("cin,cout", [(3, 16), (16, 32)])
@pytest.mark.parametrize("leaky", [True, 0.1])
def test_s2d_conv_pool_xla_bit_exact(rng, rounding, cin, cout, leaky):
    """The pure-XLA space-to-depth conv+pool (MXU path for small C_in)
    == conv+requant+pool oracle, bit-exact — at the 0.125 shift AND a
    float backbone slope (tiny/v2 pass leaky=0.1 through this entry:
    regression guard for the pooled core ignoring float slopes)."""
    B, H, W = 2, 12, 8
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, cin)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, cin, cout)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (cout,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=4, retune=11)
    got = np.asarray(fp.int8_conv_pool_s2d(
        x, w, bq, leaky=leaky, rounding=rounding, **kw))
    want = _oracle(x, w, bq, leaky=leaky, rounding=rounding, pool=True,
                   **kw)
    np.testing.assert_array_equal(got, want)


def test_int8_forward_s2d_layers_bit_exact(rng):
    """int8_forward(s2d_layers=('conv1','conv2')) == plain int8_forward."""
    from yolo_tpu.models import slim_yolo_v2
    from yolo_tpu.quant.int8_graph import quantize_pipeline

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(2), cfg,
                                      batch_norm=True)
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)]
    m = quantize_pipeline(params, cfg, batches)
    x_q = fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"])
    want = np.asarray(fp.int8_forward(m, x_q, "nearest"))
    got = np.asarray(fp.int8_forward(m, x_q, "nearest",
                                     s2d_layers=("conv1", "conv2")))
    np.testing.assert_array_equal(got, want)


def test_int8_forward_pack_tail_bit_exact(rng):
    """int8_forward(pack_tail=True) — four images 2x2-packed into one
    spatial plane for the 26² tail with zero gutters — == plain
    int8_forward, bit-exact (M-packing experiment, VERDICT r3 #8)."""
    from yolo_tpu.models import slim_yolo_v2
    from yolo_tpu.quant.int8_graph import quantize_pipeline

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(2), cfg,
                                      batch_norm=True)
    batches = [rng.random((4, 32, 32, 3), dtype=np.float32)]
    m = quantize_pipeline(params, cfg, batches)
    x_q = fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"])
    want = np.asarray(fp.int8_forward(m, x_q, "nearest"))
    got = np.asarray(fp.int8_forward(m, x_q, "nearest", pack_tail=True))
    np.testing.assert_array_equal(got, want)


def test_conv_folded_residual_bit_exact(rng):
    """int_conv_requant(residual=...) == conv then int_add_requant (the
    fold keeps the identical elementwise chain inside the conv
    epilogue)."""
    B, H, W, C = 2, 8, 8, 8
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    r = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, C, C)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (C,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=3, retune=11, padding=1,
              stride=1, leaky=True)
    y = fp.int_conv_requant(x, w, bq, **kw)
    want = np.asarray(fp.int_add_requant(y, 3, r, 5, 4))
    got = np.asarray(fp.int_conv_requant(x, w, bq, residual=(r, 5),
                                         sa_res=4, **kw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_stride2_s2d_conv_bit_exact(rng, rounding):
    """int8_conv_stride2_s2d == int_conv_requant(stride=2, padding=1)."""
    B, H, W, CIN, COUT = 2, 12, 8, 5, 16
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, CIN)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, CIN, COUT)), jnp.int8)
    bq = jnp.asarray(rng.integers(-100, 100, (COUT,)), jnp.int32)
    kw = dict(sw=8, sb=7, sa_in=4, sa_out=4, retune=11)
    want = np.asarray(fp.int_conv_requant(
        x, w, bq, padding=1, stride=2, leaky=True, rounding=rounding,
        **kw))
    got = np.asarray(fp.int8_conv_stride2_s2d(
        x, w, bq, leaky=True, rounding=rounding, **kw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_entry_pair_s2d_bit_exact(rng, rounding):
    """Fused s2d entry pair == sequential conv(s1)+conv(s2) integer
    chain, bit-exact (the darknet53 backbone entry)."""
    B, H, W = 2, 16, 12
    C0, C1, C2 = 3, 8, 16
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C0)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-30, 30, (3, 3, C0, C1)), jnp.int8)
    b1 = jnp.asarray(rng.integers(-100, 100, (C1,)), jnp.int32)
    w2 = jnp.asarray(rng.integers(-20, 20, (3, 3, C1, C2)), jnp.int8)
    b2 = jnp.asarray(rng.integers(-100, 100, (C2,)), jnp.int32)
    p1 = dict(sw=8, sb=7, sa_in=4, sa_out=3, retune=11)
    p2 = dict(sw=7, sb=6, sa_in=3, sa_out=4, retune=10)
    y = fp.int_conv_requant(x, w1, b1, padding=1, stride=1, leaky=True,
                            rounding=rounding, **p1)
    want = np.asarray(fp.int_conv_requant(
        y, w2, b2, padding=1, stride=2, leaky=True, rounding=rounding,
        **p2))
    got = np.asarray(fp.int8_entry_pair_s2d(x, w1, b1, p1, w2, b2, p2,
                                            rounding=rounding))
    np.testing.assert_array_equal(got, want)


def test_int8_forward_pallas_matches_xla(rng):
    """Full 10-layer pallas backbone == XLA int8 graph, bit-exact
    (interpret mode)."""
    from yolo_tpu.models import slim_yolo_v2
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.int8_graph import quantize_pipeline

    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(1), cfg,
                                      batch_norm=True)
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)]
    m = quantize_pipeline(params, cfg, batches)
    x_q = fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"])
    want = np.asarray(fp.int8_forward(m, x_q, "nearest"))
    got = np.asarray(fp.int8_forward_pallas(m, x_q, "nearest",
                                            interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
@pytest.mark.parametrize("sa_res", [None, 3])
def test_res_block_kernel_bit_exact(rng, rounding, sa_res):
    """Fused 1x1->3x3[->residual] block kernel == the chained XLA graph
    (int_conv_requant -> int_conv_requant(residual=...))."""
    from yolo_tpu.kernels.int8_conv import int8_res_block

    B, H, W, C, CMID = 2, 8, 6, 16, 8
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-30, 30, (1, 1, C, CMID)), jnp.int8)
    b1 = jnp.asarray(rng.integers(-100, 100, (CMID,)), jnp.int32)
    w2 = jnp.asarray(rng.integers(-30, 30, (3, 3, CMID, C)), jnp.int8)
    b2 = jnp.asarray(rng.integers(-100, 100, (C,)), jnp.int32)
    p1 = dict(sw=8, sb=7, sa_in=4, sa_out=3, retune=11)
    p2 = dict(sw=7, sb=8, sa_in=3, sa_out=4, retune=10)

    y1 = fp.int_conv_requant(x, w1, b1, padding=0, stride=1, leaky=True,
                             rounding=rounding, **p1)
    want = fp.int_conv_requant(
        y1, w2, b2, padding=1, stride=1, leaky=True, rounding=rounding,
        residual=None if sa_res is None else (x, p1["sa_in"]),
        sa_res=sa_res, **p2)
    got = int8_res_block(x, w1, b1, p1, w2, b2, p2, sa_res=sa_res,
                         rounding=rounding, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("row_tile,batch_tile", [(4, 1), (3, 2), (12, 2)])
def test_res_block_kernel_tilings(rng, row_tile, batch_tile):
    """Row/batch tilings (incl. edge-mask chunks and nb>1 roll wrap) all
    reproduce the exact chain."""
    from yolo_tpu.kernels.int8_conv import int8_res_block

    B, H, W, C, CMID = 4, 12, 9, 8, 8
    x = jnp.asarray(rng.integers(-128, 128, (B, H, W, C)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-30, 30, (1, 1, C, CMID)), jnp.int8)
    b1 = jnp.asarray(rng.integers(-100, 100, (CMID,)), jnp.int32)
    w2 = jnp.asarray(rng.integers(-30, 30, (3, 3, CMID, C)), jnp.int8)
    b2 = jnp.asarray(rng.integers(-100, 100, (C,)), jnp.int32)
    p1 = dict(sw=8, sb=7, sa_in=4, sa_out=3, retune=11)
    p2 = dict(sw=7, sb=8, sa_in=3, sa_out=5, retune=10)

    y1 = fp.int_conv_requant(x, w1, b1, padding=0, stride=1, **p1)
    want = fp.int_conv_requant(y1, w2, b2, padding=1, stride=1,
                               residual=(x, p1["sa_in"]), sa_res=4, **p2)
    for wide in (True, False):
        got = int8_res_block(x, w1, b1, p1, w2, b2, p2, sa_res=4,
                             row_tile=row_tile, batch_tile=batch_tile,
                             wide_dx=wide, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
