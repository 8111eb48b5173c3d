"""QAT (quant/qat.py): STE gradients, value-parity with the PTQ
simulation, master-weight integrity, and loss descent under the
fake-quant forward."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.quant import generic
from yolo_tpu.quant import qat
from yolo_tpu.quant import quantize as q
from yolo_tpu.quant.bn_fold import fold_batch_norm
from yolo_tpu.train.targets import build_targets


def _frozen_state(max_abs: float):
    st = q.tracker_init()
    return q.tracker_update(st, jnp.asarray([max_abs]))


def test_tracker_ste_value_matches_ptq_sim():
    """qat.tracker_quantize_ste values == quantize.tracker_quantize
    (update=False) values, including at and beyond the rails."""
    st = _frozen_state(3.7)
    x = jnp.linspace(-6.0, 6.0, 4001)
    ours = qat.tracker_quantize_ste(st, x)
    ref, _ = q.tracker_quantize(st, x, update=False)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_tracker_ste_gradient_clipped():
    """Gradient is identity inside the rails, zero where the clip
    saturates."""
    st = _frozen_state(3.7)
    scale = float(q.tracker_pow2(st))
    hi = 127.0 / scale
    g = jax.grad(lambda x: jnp.sum(qat.tracker_quantize_ste(st, x)))(
        jnp.asarray([0.0, hi * 0.5, -hi * 0.9, hi * 2.0, -hi * 3.0]))
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 1.0, 0.0, 0.0])


def test_weight_ste_gradient_is_identity():
    t = jnp.asarray([-0.31, 0.002, 0.9])
    g = jax.grad(lambda w: jnp.sum(qat.fake_quantize_ste(w)))(t)
    np.testing.assert_array_equal(np.asarray(g), [1.0, 1.0, 1.0])
    np.testing.assert_array_equal(
        np.asarray(qat.fake_quantize_ste(t)), np.asarray(q.fake_quantize(t)))


def _tiny_qat_setup(batch=2):
    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64))
    det = Detector(cfg, batch_norm=False)
    params = fold_batch_norm(
        Detector(cfg).init_params(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(1)
    images = rng.random((batch, 64, 64, 3), dtype=np.float32)
    params_q = generic.fake_quantize_all_convs(params)
    states = generic.calibrate_generic(det.module, params_q, cfg, [images])
    return det, params, states, images


def test_qat_forward_matches_generic_quant_forward():
    """The QAT module's (eval-mode) outputs are bit-identical to the
    generic PTQ fake-quant forward with the same frozen states."""
    det, params, states, images = _tiny_qat_setup()
    qmod = qat.QATModule(det.module, states)
    outs = qmod.forward(params, jnp.asarray(images), det.cfg)
    params_q = generic.fake_quantize_all_convs(params)
    ref, _, _ = generic.quant_forward_generic(
        det.module, params_q, jnp.asarray(images), det.cfg, list(states))
    for a, b in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qat_step_preserves_master_weights_at_lr0():
    """With lr=0 the masters must come back BIT-identical: the update
    base is the fp32 tree, never the fake-quantized forward tree."""
    det, params, states, images = _tiny_qat_setup()
    gt = build_targets(det.cfg, [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * 2)

    def one_batch():
        yield images, gt

    new_params, _ = qat.qat_finetune(det, params, states, one_batch(),
                                     base_lr=0.0, steps=1)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(params)),
                    jax.tree_util.tree_leaves(jax.device_get(new_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qat_finetune_reduces_fakequant_loss():
    """Training through the STE forward on a fixed batch lowers the
    fake-quant loss — the gradient actually flows through round/clip."""
    det, params, states, images = _tiny_qat_setup()
    gt = build_targets(det.cfg, [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * 2)

    from yolo_tpu.train.trainer import TrainConfig, make_train_step
    qmod = qat.QATModule(det.module, states)
    tc = TrainConfig(base_lr=1e-4, wp_epoch=0)
    opt, step = make_train_step(qmod, det.cfg, tc, donate=False)
    opt_state = opt.init(params)
    losses = []
    for _ in range(10):
        params, opt_state, metrics = step(params, opt_state, images, gt,
                                          1e-4)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_qat_finetune_rejects_bn_params():
    """QAT on an unfolded (BN) tree would train against a grid the
    deployed folded model never uses — must fail loudly (ADVICE r3)."""
    import pytest

    cfg = get_config("slim_yolo_v2", "mask", input_size=(64, 64))
    det = Detector(cfg, batch_norm=False)
    params_bn = Detector(cfg).init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="BN-folded"):
        qat.qat_finetune(det, params_bn, [], iter([]))


def test_quantize_detector_frozen_states_are_served():
    """Passing states= skips re-calibration: the detect fn must compute
    with EXACTLY those scales (ADVICE r3: post-QAT eval/export must use
    the frozen QAT states)."""
    det, params, states, images = _tiny_qat_setup()
    # deliberately perturb one mid-net scale so re-calibration would
    # disagree with it
    frozen = [dict(s) for s in states]
    frozen[2] = _frozen_state(1e4)
    params_q, out_states, detect = generic.quantize_detector(
        det, params, [images], fold_bn=False, states=frozen)
    assert out_states is frozen
    # forward through quant_forward_generic with the same frozen states
    ref, _, _ = generic.quant_forward_generic(
        det.module, params_q, jnp.asarray(images), det.cfg, list(frozen))
    from yolo_tpu import detector as D

    class _M:
        STRIDES = det.module.STRIDES

        @staticmethod
        def forward(p, x, cfg, train=False):
            return generic.quant_forward_generic(
                det.module, p, x, cfg, list(frozen))[0]

    boxes_ref, probs_ref = D.predict(_M, params_q, jnp.asarray(images),
                                     det.cfg)
    got = detect(jnp.asarray(images))
    from yolo_tpu.ops import nms
    want = nms.batched_postprocess(
        boxes_ref, probs_ref, det.cfg.conf_thresh, det.cfg.nms_thresh,
        det.cfg.pre_nms_top_k, det.cfg.top_k)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_weight_ste_per_channel_and_subbit_match_engine_grid():
    """fake_quantize_ste at (weight_bitwidth, per_channel) must round to
    the EXACT grid fixed_point.quantize_model serves: levels match
    quantize_pow2_np at the same width/axis."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(0, 0.3, (3, 3, 4, 8)).astype(np.float32))
    for bits, axis in [(4, None), (4, -1), (8, -1), (5, -1)]:
        ste = np.asarray(qat.fake_quantize_ste(w, bits, axis))
        lv, s_exp = q.quantize_pow2_np(np.asarray(w), bits,
                                       channel_axis=axis)
        np.testing.assert_allclose(ste, lv / np.exp2(np.float32(s_exp)),
                                    rtol=0, atol=1e-7)
        # gradient stays identity regardless of grid
        g = jax.grad(lambda t: jnp.sum(
            qat.fake_quantize_ste(t, bits, axis)))(w)
        np.testing.assert_array_equal(np.asarray(g), np.ones_like(ste))


def test_qat_module_subbit_per_channel_forward_matches_qsim_grid():
    """QATModule(weight_bitwidth=4, per_channel=True) eval forward ==
    the generic fake-quant forward on params fake-quantized with the
    same width/axis — the STE tree transform hits every conv leaf with
    the serving grid."""
    det, params, _, images = _tiny_qat_setup()
    from yolo_tpu.quant import qsim

    params_q = qsim.fake_quantize_params(params, weight_bitwidth=4,
                                         per_channel=True)
    states = generic.calibrate_generic(det.module, params_q, det.cfg,
                                       [images])
    qmod = qat.QATModule(det.module, states, weight_bitwidth=4,
                         per_channel=True)
    outs = qmod.forward(params, jnp.asarray(images), det.cfg)
    ref, _, _ = generic.quant_forward_generic(
        det.module, params_q, jnp.asarray(images), det.cfg, list(states))
    for a, b in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qat_finetune_subbit_per_channel_runs_and_preserves_masters():
    """qat_finetune with the sub-8/per-channel grid at lr=0 returns
    bit-identical masters (the grid options change the forward, not the
    update base)."""
    det, params, states, images = _tiny_qat_setup()
    gt = build_targets(det.cfg, [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * 2)
    new_params, _ = qat.qat_finetune(det, params, states,
                                     iter([(images, gt)]), base_lr=0.0,
                                     steps=1, weight_bitwidth=5,
                                     per_channel=True)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(params)),
                    jax.tree_util.tree_leaves(jax.device_get(new_params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
