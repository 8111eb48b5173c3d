"""Quantization toolchain tests: BN-fold algebra, pow2 quantization,
tracker EMA, PTQ pipeline, and int8 graph bit-exactness vs the numpy
oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.models import slim_yolo_v2
from yolo_tpu.ops import blocks
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant import qsim, quantize as q
from yolo_tpu.quant.bn_fold import fold_batch_norm
from yolo_tpu.quant.int8_graph import (
    build_int8_detect, int8_predict, quantize_pipeline)
from yolo_tpu.quant.retune import export_c_header, export_tables

CFG = get_config("slim_yolo_v2", "mask", input_size=(32, 32))


def _rand_params(key=0):
    return slim_yolo_v2.init_params(jax.random.PRNGKey(key), CFG,
                                    batch_norm=True)


def _rand_bn_stats(params, rng):
    """Give BN layers non-trivial running stats (fresh init is identity)."""
    def visit(p):
        if isinstance(p, dict):
            if "bn" in p:
                c = p["bn"]["mean"].shape[0]
                p = dict(p, bn={
                    "gamma": jnp.asarray(
                        rng.random(c, dtype=np.float32) + 0.5),
                    "beta": jnp.asarray(
                        rng.standard_normal(c).astype(np.float32)),
                    "mean": jnp.asarray(
                        rng.standard_normal(c).astype(np.float32) * 0.1),
                    "var": jnp.asarray(
                        rng.random(c, dtype=np.float32) + 0.5),
                })
                return p
            return {k: visit(v) for k, v in p.items()}
        return p
    return visit(params)


def test_bn_fold_preserves_forward(rng):
    params = _rand_bn_stats(_rand_params(), rng)
    fused = fold_batch_norm(params)

    def has_bn(p):
        if isinstance(p, dict):
            return "bn" in p or any(has_bn(v) for v in p.values())
        return False
    assert not has_bn(fused)
    x = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    out_bn = slim_yolo_v2.forward(params, x, CFG)[0]
    out_fused = slim_yolo_v2.forward(fused, x, CFG)[0]
    np.testing.assert_allclose(np.asarray(out_bn), np.asarray(out_fused),
                               rtol=1e-3, atol=1e-4)


def test_pow2_quantize_grid(rng):
    t = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
    vals, scale = q.quantize_pow2(t)
    s = float(scale)
    # scale is a power of two
    assert np.log2(s) == round(np.log2(s))
    # levels are integers within int8 range
    v = np.asarray(vals)
    assert np.all(v == np.round(v))
    assert np.abs(v).max() <= 127
    # fake-quant error bounded by half a step
    fq = np.asarray(q.fake_quantize(t))
    assert np.abs(fq - np.asarray(t)).max() <= 0.5 / s + 1e-7


def test_tracker_ema_semantics():
    st = q.tracker_init()
    a1 = jnp.full((4,), 2.0)
    _, st = q.tracker_quantize(st, a1, update=True)
    np.testing.assert_allclose(float(st["scale"]), 127 / 2.0)  # first: init
    a2 = jnp.full((4,), 4.0)
    _, st = q.tracker_quantize(st, a2, update=True)
    want = 0.9 * (127 / 2.0) + 0.1 * (127 / 4.0)
    np.testing.assert_allclose(float(st["scale"]), want, rtol=1e-6)
    # frozen: no update
    _, st2 = q.tracker_quantize(st, jnp.full((4,), 100.0), update=False)
    np.testing.assert_allclose(float(st2["scale"]), want, rtol=1e-6)
    # quantized value uses pow2-floored scale
    v, _ = q.tracker_quantize(st, jnp.asarray([1.234]), update=False)
    p2 = float(q.tracker_pow2(st))
    np.testing.assert_allclose(float(v[0]), np.round(p2 * 1.234) / p2)


def test_quant_forward_passthrough_without_quantization(rng):
    fused = fold_batch_norm(_rand_bn_stats(_rand_params(), rng))
    x = jnp.asarray(rng.random((1, 32, 32, 3), dtype=np.float32))
    states = qsim.init_tracker_states()
    outs, _, _ = qsim.quant_forward(fused, x, CFG, states,
                                    quantization=False)
    ref = slim_yolo_v2.forward(fused, x, CFG)[0]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _calibrated_int8(rng, n_batches=3):
    fused = fold_batch_norm(_rand_bn_stats(_rand_params(), rng))
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)
               for _ in range(n_batches)]
    m = quantize_pipeline(fused, CFG, batches, fold_bn=False)
    return fused, batches, m


def test_quantize_pipeline_tables(rng):
    _, _, m = _calibrated_int8(rng)
    t = export_tables(m)
    assert len(t["scale_w"]) == len(t["scale_b"]) == len(t["retune"]) == 10
    assert len(t["scale_a"]) == 11
    # weights are int8
    for name, w in m.w_q.items():
        assert w.dtype == jnp.int8


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_int8_xla_matches_numpy_oracle(rng, rounding):
    _, batches, m = _calibrated_int8(rng)
    x = batches[0]
    x_q = fp.quantize_input(jnp.asarray(x), m.sa["in"])
    got = np.asarray(fp.int8_forward(m, x_q, rounding))
    want = fp.int8_forward_numpy(m, np.asarray(x_q), rounding)
    np.testing.assert_array_equal(got, want)  # bit-exact


def test_int8_close_to_float_sim(rng):
    fused, batches, m = _calibrated_int8(rng)
    params_q = qsim.fake_quantize_params(fused)
    states = qsim.calibrate(params_q, CFG, batches)
    x = jnp.asarray(batches[0])
    float_out, _, _ = qsim.quant_forward(params_q, x, CFG, states,
                                         quantization=True)
    x_q = fp.quantize_input(x, m.sa["in"])
    int_out = fp.int8_forward(m, x_q, "nearest")
    a, b = np.asarray(float_out[0]), np.asarray(int_out)
    # same scale grid; expect close agreement (requant rounding differs)
    denom = np.abs(a).max()
    assert np.abs(a - b).max() / denom < 0.15
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98


def test_retune_prevents_overflow(rng):
    """With searched retune shifts, the int16-scaled accumulator stays in
    range on the calibration data (the property the reference's find-mode
    asserts enforce, models/slim_yolo_v2.py:222-227)."""
    fused, batches, m = _calibrated_int8(rng)
    params_q = qsim.fake_quantize_params(fused)
    states = qsim.calibrate(params_q, CFG, batches)
    for x in batches:
        _, _, maxima = qsim.quant_forward(params_q, jnp.asarray(x), CFG,
                                          states, quantization=True)
        for name, mx in maxima.items():
            assert float(mx) * 2.0 ** m.retune[name] < 2 ** 15


def test_int8_detect_runs(rng):
    fn, m = build_int8_detect(CFG)
    images = rng.random((2, 32, 32, 3), dtype=np.float32)
    boxes, scores, cls, valid = jax.device_get(fn(None, images))
    assert boxes.shape == (2, CFG.top_k, 4)
    assert np.isfinite(scores).all()


def test_export_c_header(rng, tmp_path):
    _, _, m = _calibrated_int8(rng)
    path = tmp_path / "weight.h"
    export_c_header(m, str(path))
    text = path.read_text()
    assert "const char scale_w[10]" in text
    assert "const char scale_a[11]" in text
    assert "weight_0[" in text and "bias_9[" in text


def test_weight_bitwidth_subint8(rng):
    """weight_bitwidth=4: weight levels fit +-7, bias/activations stay
    int8, and the unchanged integer engine remains bit-exact with the
    numpy oracle (sub-8-bit levels are a subset of int8 — only sw
    moves). scripts/quant_bitwidth.py builds on this."""
    fused = fold_batch_norm(_rand_bn_stats(_rand_params(), rng))
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)
               for _ in range(2)]
    m = quantize_pipeline(fused, CFG, batches, fold_bn=False,
                          weight_bitwidth=4)
    for name, w in m.w_q.items():
        assert int(np.abs(np.asarray(w)).max()) <= 7, name
        assert int(np.abs(np.asarray(m.b_q[name])).max()) <= 127
    x_q = fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"])
    got = np.asarray(fp.int8_forward(m, x_q))
    want = fp.int8_forward_numpy(m, np.asarray(x_q))
    np.testing.assert_array_equal(got, want)
    # default path unchanged: 8-bit weights exceed the 4-bit range
    m8 = quantize_pipeline(fused, CFG, batches, fold_bn=False)
    assert max(int(np.abs(np.asarray(w)).max())
               for w in m8.w_q.values()) > 7


def test_retune_finetune_keeps_best_checkpoint():
    """retune_finetune with eval_fn returns the BEST-scoring params seen,
    not necessarily the last (reference retune driver per-epoch eval +
    save-on-improvement, retune_bias_quantize.py:374-420)."""
    import jax
    from yolo_tpu.config import get_config
    from yolo_tpu.detector import Detector
    from yolo_tpu.quant.bn_fold import fold_batch_norm
    from yolo_tpu.quant.retune import retune_finetune
    from yolo_tpu.train.targets import build_targets

    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64))
    det = Detector(cfg, batch_norm=False)
    params = fold_batch_norm(Detector(cfg).init_params(
        jax.random.PRNGKey(0)))
    rng = np.random.default_rng(3)
    images = rng.random((2, 64, 64, 3), dtype=np.float32)
    gt = build_targets(cfg, [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * 2)

    def batches():
        while True:
            yield images, gt

    # scripted eval: step 1 scores 0.9, later evals score lower -> the
    # returned params must be the step-1 snapshot
    scores = iter([0.9, 0.1, 0.1, 0.1, 0.1])
    snap = {}

    def eval_fn(p):
        s = next(scores)
        if s == 0.9:
            snap["best"] = jax.device_get(p)
        return s

    best, _ = retune_finetune(det, params, batches(), base_lr=1e-3,
                              steps=3, eval_fn=eval_fn, eval_every=1)
    for a, b in zip(jax.tree_util.tree_leaves(snap["best"]),
                    jax.tree_util.tree_leaves(jax.device_get(best))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tracker_percentile_clip():
    """stat_q tracks the q-th percentile of |act| instead of the max —
    the per-tracker clip quant/autoclip.py's search sweeps."""
    st = q.tracker_init()
    act = jnp.asarray(np.concatenate([np.full(99, 1.0), [100.0]]),
                      jnp.float32)
    st_max = q.tracker_update(q.tracker_init(), act)
    st_pct = q.tracker_update(st, act, stat_q=99.0)
    # abs-max sees the 100.0 outlier; the 99th percentile mostly ignores
    # it (linear interpolation between v[98]=1 and v[99]=100 -> ~1.99)
    assert float(st_max["scale"]) == pytest.approx(127 / 100.0)
    assert float(st_pct["scale"]) > 30 * float(st_max["scale"])
    # stat_q=100 / None keep reference abs-max semantics
    st_100 = q.tracker_update(q.tracker_init(), act, stat_q=100.0)
    assert float(st_100["scale"]) == float(st_max["scale"])


def test_pow2_quantize_per_channel(rng):
    """Per-channel scales: each output channel gets its own pow2 grid,
    host twin matches the device computation."""
    t = jnp.asarray(rng.standard_normal((3, 3, 8, 16)).astype(np.float32))
    t = t * jnp.asarray(2.0 ** rng.integers(-4, 5, 16), jnp.float32)
    vals, scale = q.quantize_pow2(t, channel_axis=-1)
    assert scale.shape == (1, 1, 1, 16)
    s = np.asarray(scale).ravel()
    assert np.all(np.log2(s) == np.round(np.log2(s)))
    v = np.asarray(vals)
    assert np.all(v == np.round(v)) and np.abs(v).max() <= 127
    # per-channel fake-quant error is bounded by each channel's own step
    fq = np.asarray(q.fake_quantize(t, channel_axis=-1))
    err = np.abs(fq - np.asarray(t)).max(axis=(0, 1, 2))
    assert np.all(err <= 0.5 / s + 1e-6)
    # host twin: identical levels and exponents
    lv, se = q.quantize_pow2_np(np.asarray(t), channel_axis=-1)
    np.testing.assert_array_equal(lv, v)
    np.testing.assert_array_equal(se, np.log2(s).astype(np.int32))


@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_int8_per_channel_engine_matches_oracle(rng, rounding):
    """per_channel=True: vector sw shift chain stays bit-exact between
    the XLA engine and the numpy oracle (VERDICT r4 next #5)."""
    fused = fold_batch_norm(_rand_bn_stats(_rand_params(), rng))
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)
               for _ in range(2)]
    m = quantize_pipeline(fused, CFG, batches, fold_bn=False,
                          per_channel=True)
    for name in m.sw:
        assert np.ndim(m.sw[name]) == 1, name  # per-channel exponents
    x_q = fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"])
    got = np.asarray(fp.int8_forward(m, x_q, rounding))
    want = fp.int8_forward_numpy(m, np.asarray(x_q), rounding)
    np.testing.assert_array_equal(got, want)
    # per-channel grids can't export to the one-scale-per-layer C contract
    with pytest.raises(ValueError, match="per-channel"):
        export_tables(m)
    # ...nor run the phase-packed s2d forms
    with pytest.raises(ValueError, match="per-channel"):
        fp.int8_forward(m, x_q, s2d_layers=("conv1",))


def test_per_channel_at_least_as_fine(rng):
    """Every per-channel weight grid is at least as fine as the
    per-tensor grid (the per-tensor exponent is the min over channels)."""
    fused = fold_batch_norm(_rand_bn_stats(_rand_params(), rng))
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)]
    m_pt = quantize_pipeline(fused, CFG, batches, fold_bn=False)
    m_pc = quantize_pipeline(fused, CFG, batches, fold_bn=False,
                             per_channel=True)
    for name in m_pt.sw:
        assert np.all(np.asarray(m_pc.sw[name]) >= m_pt.sw[name]), name
        assert np.min(np.asarray(m_pc.sw[name])) == m_pt.sw[name], name
