"""Structural performance guards on the serving program text
(VERDICT r2 next #8).

The suite is otherwise correctness-only; these tests protect the r2/r3
fusion wins structurally, so a numerics-preserving refactor that quietly
reintroduces f32 convolutions (e.g. a dequantize slipping above a conv)
or float accumulation fails the suite instead of the next TPU benchmark
run. Checks run on the backend-independent StableHLO from
``jax.jit(...).lower()``; a TPU-only check additionally asserts the
compiled HLO keeps every convolution inside a fusion (requant in the
conv epilogue — docs/PERFORMANCE.md finding #4).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.int8_graph import build_int8_detect, make_int8_detect_fn

SIZE = 64


@pytest.fixture(scope="module")
def int8_slim():
    cfg = get_config("slim_yolo_v2", "mask", input_size=(SIZE, SIZE),
                     pre_nms_top_k=32)
    _, m = build_int8_detect(cfg)
    return m, cfg


def _conv_lines(stablehlo_text):
    return [ln for ln in stablehlo_text.splitlines()
            if "stablehlo.convolution" in ln]


def _lower_text(m, cfg, x):
    detect = make_int8_detect_fn(m, cfg)
    return jax.jit(lambda im: detect(im)).lower(x).as_text()


def test_serving_convs_all_integer_f32_input(int8_slim):
    """Float-input serving graph: EVERY convolution consumes i8 and
    accumulates in i32 — quantize happens once at the input, never
    between layers."""
    m, cfg = int8_slim
    x = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
    convs = _conv_lines(_lower_text(m, cfg, x))
    assert len(convs) >= 10, "expected the full conv stack"
    for ln in convs:
        assert "f32" not in ln, f"float convolution in serving graph:\n{ln}"
        assert "xi8>" in ln, f"non-int8 conv operand:\n{ln}"
        assert re.search(r"->\s*tensor<[^>]*xi32>", ln), (
            f"conv does not accumulate in i32:\n{ln}")


def test_serving_int8_input_no_backbone_floats(int8_slim):
    """int8-input serving graph: no f32 convolution AND no i8->f32
    dequantize feeding one (the host-quantize fast path stays integer
    end-to-end until the decode tail)."""
    m, cfg = int8_slim
    x = jnp.zeros((2, SIZE, SIZE, 3), jnp.int8)
    text = _lower_text(m, cfg, x)
    convs = _conv_lines(text)
    assert len(convs) >= 10
    for ln in convs:
        assert "f32" not in ln and "xi8>" in ln, ln


def test_int_conv_requant_epilogue_is_integer(rng):
    """The requant chain (shift/bias/clip/leaky) lowers as pure integer
    ops on the conv accumulator — no float detour XLA would have to
    break the epilogue fusion for."""
    x = jnp.asarray(rng.integers(-128, 128, (1, 16, 16, 8)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, 8, 16)), jnp.int8)
    b = jnp.asarray(rng.integers(-100, 100, (16,)), jnp.int32)

    def f(x):
        return fp.int_conv_requant(x, w, b, sw=8, sb=7, sa_in=4,
                                   sa_out=4, retune=11, padding=1,
                                   stride=1, leaky=True)

    text = jax.jit(f).lower(x).as_text()
    assert "f32" not in text, "float op inside the integer requant chain"
    assert "stablehlo.divide" not in text, (
        "division in requant (must be shifts)")


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fusion layout check is TPU-specific")
def test_tpu_compiled_convs_fused(int8_slim):
    """On TPU, every convolution must live inside a fusion computation
    (requant riding the MXU epilogue, not round-tripping i32 to HBM)."""
    m, cfg = int8_slim
    detect = make_int8_detect_fn(m, cfg)
    x = jnp.zeros((2, SIZE, SIZE, 3), jnp.int8)
    text = jax.jit(lambda im: detect(im)).lower(x).compile().as_text()
    in_entry = False
    for ln in text.splitlines():
        if ln.startswith("ENTRY"):
            in_entry = True
        elif in_entry and ln.startswith("}"):
            in_entry = False
        elif in_entry and " convolution(" in ln:
            raise AssertionError(
                f"unfused convolution in ENTRY computation:\n{ln}")


def test_bf16_train_step_convs_are_bf16():
    """Mixed-precision guard: with compute_dtype='bfloat16' EVERY
    convolution in the train step (forward AND backward) runs in bf16 —
    the 2x-MXU win of docs/TRAINING.md can't silently regress to f32
    (e.g. an fp32 master param reaching a conv uncast)."""
    from yolo_tpu.detector import Detector
    from yolo_tpu.train.targets import build_targets
    from yolo_tpu.train.trainer import TrainConfig, make_train_step

    cfg = get_config("slim_yolo_v2", "mask", input_size=(SIZE, SIZE))
    det = Detector(cfg)
    params = det.init_params(jax.random.PRNGKey(0))
    tc = TrainConfig(base_lr=1e-4, compute_dtype="bfloat16")
    opt, step = make_train_step(det.module, det.cfg, tc, donate=False)
    opt_state = opt.init(params)
    images = jnp.zeros((2, SIZE, SIZE, 3), jnp.float32)
    gt = build_targets(cfg, [np.array([[0.2, 0.2, 0.7, 0.8, 1.0]])] * 2)
    text = jax.jit(step).lower(params, opt_state, images, gt,
                               1e-4).as_text()
    convs = _conv_lines(text)
    assert len(convs) >= 10, "expected forward + backward conv stack"
    bad = [ln for ln in convs if "bf16" not in ln]
    assert not bad, f"non-bf16 convolution in bf16 train step:\n{bad[0]}"


def test_stride2_s2d_conv_is_mxu_shaped(rng):
    """The space-to-depth stride-2 form must lower to ONE convolution
    whose contraction is 4*C_in (the MXU mapping it exists for)."""
    CIN = 16
    x = jnp.asarray(rng.integers(-128, 128, (1, 32, 32, CIN)), jnp.int8)
    w = jnp.asarray(rng.integers(-30, 30, (3, 3, CIN, 32)), jnp.int8)
    b = jnp.asarray(rng.integers(-100, 100, (32,)), jnp.int32)

    def f(x):
        return fp.int8_conv_stride2_s2d(x, w, b, sw=8, sb=7, sa_in=4,
                                        sa_out=4, retune=11)

    convs = _conv_lines(jax.jit(f).lower(x).as_text())
    assert len(convs) == 1
    assert f"x{4 * CIN}xi8>" in convs[0], (
        f"expected contraction {4 * CIN}:\n{convs[0]}")
