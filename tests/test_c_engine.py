"""Consumption test for the weight.h deployment artifact.

The reference deploys by baking weights/exponent tables into weight.h
and running them through its C engine (c_embedding/yolo_forward.c).
This test closes the same loop for yolo_tpu: it exports a calibrated
Int8Model via quant/retune.py:export_c_header, generates a model.h
driver around it, compiles the independent C implementation of the
fixed-point datapath (native/int8_engine.c) with the system compiler,
runs the full 10-layer slim forward in C, and asserts the int8 head is
byte-for-byte identical to the TPU engine's numpy oracle
(fixed_point.int8_forward_numpy — itself bit-identical to the XLA and
Pallas engines per tests/test_quant.py / test_kernels.py).

A green run proves: exported artifact -> independent C deployment ->
the exact bits the TPU serves.
"""

import pathlib
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.models.slim_yolo_v2 import CONV_LAYERS
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.bn_fold import fold_batch_norm
from yolo_tpu.quant.int8_graph import quantize_pipeline
from yolo_tpu.quant.retune import export_c_header

from test_quant import _rand_bn_stats, _rand_params  # noqa: E402

CFG = get_config("slim_yolo_v2", "mask", input_size=(32, 32))

CC = shutil.which("cc") or shutil.which("gcc")


def _c_array(name, values):
    vals = ", ".join(str(int(v)) for v in np.asarray(values).ravel())
    return f"static const signed char {name}[] = {{{vals}}};"


def _write_model_h(path, m, x_q, expected, rounding):
    pred_out = CFG.anchors_per_scale * (1 + 4 + CFG.num_classes)
    schedule = list(CONV_LAYERS) + [("pred", 256, pred_out, False)]
    n = len(schedule)
    lines = [
        '#include "weight.h"',
        f"#define N_LAYERS {n}",
        f"#define IMG_B {x_q.shape[0]}",
        f"#define IMG_H {x_q.shape[1]}",
        f"#define IMG_W {x_q.shape[2]}",
        f"#define ROUND_NEAREST {1 if rounding == 'nearest' else 0}",
        "static const int c_in[N_LAYERS] = {%s};"
        % ", ".join(str(ci) for _, ci, _, _ in schedule),
        "static const int c_out[N_LAYERS] = {%s};"
        % ", ".join(str(co) for _, _, co, _ in schedule),
        "static const int pool[N_LAYERS] = {%s};"
        % ", ".join(str(int(p)) for _, _, _, p in schedule),
        "static const signed char *weights[N_LAYERS] = {%s};"
        % ", ".join(f"weight_{i}" for i in range(n)),
        "static const signed char *biases[N_LAYERS] = {%s};"
        % ", ".join(f"bias_{i}" for i in range(n)),
        _c_array("input", x_q),
        _c_array("expected", expected),
    ]
    path.write_text("\n".join(lines) + "\n")


@pytest.mark.skipif(CC is None, reason="no C compiler on PATH")
@pytest.mark.parametrize("rounding", ["nearest", "floor"])
def test_c_engine_consumes_weight_h(rng, tmp_path, rounding):
    fused = fold_batch_norm(_rand_bn_stats(_rand_params(), rng))
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)
               for _ in range(3)]
    m = quantize_pipeline(fused, CFG, batches, fold_bn=False)

    export_c_header(m, str(tmp_path / "weight.h"))

    x_q = np.asarray(
        fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"]))
    head = fp.int8_forward_numpy(m, x_q, rounding)
    # recover the exact int8 head the engine holds before dequant
    expected = np.round(head * 2.0 ** m.sa["pred"]).astype(np.int8)

    _write_model_h(tmp_path / "model.h", m, x_q, expected, rounding)

    exe = tmp_path / "engine"
    subprocess.run(
        [CC, "-O2", "-I", str(tmp_path), "-o", str(exe),
         str(pathlib.Path(__file__).resolve().parents[1]
             / "native" / "int8_engine.c")],
        check=True, capture_output=True, text=True)
    res = subprocess.run([str(exe)], capture_output=True, text=True)
    assert res.returncode == 0, (
        f"C engine output diverged from the TPU oracle:\n"
        f"{res.stdout}{res.stderr}")
    assert "match" in res.stdout
