"""Full embedded-pipeline parity: the C program (conv engine + software
decode/NMS tail, native/yolo_pipeline.c — the complete yolo_forward.c
role) must reproduce the Python pipeline's detections from the exported
weight.h artifact.

The int8 head is bit-identical between C and the TPU engines
(tests/test_c_engine.py), so the tail comparison is C double math vs a
numpy float64 reference tail with the exact postprocess oracle
(ops/nms.py:postprocess_numpy) — agreement to 1e-6 on boxes, 1e-9 on
scores, exact on classes/counts.
"""

import pathlib
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from yolo_tpu.config import get_config
from yolo_tpu.ops import nms
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.bn_fold import fold_batch_norm
from yolo_tpu.quant.int8_graph import quantize_pipeline
from yolo_tpu.quant.retune import export_c_header

from test_c_engine import _write_model_h  # noqa: E402
from test_quant import _rand_bn_stats, _rand_params  # noqa: E402

CFG = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
CC = shutil.which("cc") or shutil.which("gcc")
CONF_THRESH, NMS_THRESH = 0.05, 0.5


def _python_tail_f64(head_i8, sa_pred, cfg):
    """Reference tail in float64: dequant + split + decode + score +
    postprocess oracle. Returns per-image (boxes, scores, cls) lists."""
    b, gh, gw, ch = head_i8.shape
    a, c = cfg.anchors_per_scale, cfg.num_classes
    stride = cfg.strides[0]
    h = head_i8.astype(np.float64) * 2.0 ** -sa_pred
    h = h.reshape(b, gh * gw, ch)
    conf = h[:, :, :a].reshape(b, gh * gw * a)
    cls = h[:, :, a:(1 + c) * a].reshape(b, gh * gw * a, c)
    txt = h[:, :, (1 + c) * a:].reshape(b, gh * gw, a, 4)

    gy, gx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    grid = np.stack([gx, gy], -1).reshape(1, gh * gw, 1, 2).astype(
        np.float64)
    anchors = np.asarray(cfg.anchor_size, np.float64).reshape(1, 1, a, 2)

    sig = lambda v: 1.0 / (1.0 + np.exp(-v))  # noqa: E731
    xy = (sig(txt[..., :2]) + grid) * stride
    wh = np.exp(txt[..., 2:]) * anchors * stride
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], -1).reshape(
        b, gh * gw * a, 4)
    hh, ww = cfg.input_size
    boxes = np.clip(boxes / np.array([ww, hh, ww, hh], np.float64), 0, 1)

    e = np.exp(cls - cls.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True) * sig(conf)[..., None]

    out = []
    for i in range(b):
        out.append(nms.postprocess_numpy(
            boxes[i], probs[i], c, CONF_THRESH, NMS_THRESH))
    return out


@pytest.mark.skipif(CC is None, reason="no C compiler on PATH")
def test_c_pipeline_matches_python_detections(rng, tmp_path):
    fused = fold_batch_norm(_rand_bn_stats(_rand_params(), rng))
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)
               for _ in range(3)]
    m = quantize_pipeline(fused, CFG, batches, fold_bn=False)
    export_c_header(m, str(tmp_path / "weight.h"))

    x_q = np.asarray(
        fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"]))
    head_f = fp.int8_forward_numpy(m, x_q)
    head_i8 = np.round(head_f * 2.0 ** m.sa["pred"]).astype(np.int8)

    dets = _python_tail_f64(head_i8, m.sa["pred"], CFG)
    n_total = sum(len(d[0]) for d in dets)
    assert n_total >= 4, "random model produced too few detections to " \
                         "make the NMS comparison meaningful"

    _write_model_h(tmp_path / "model.h", m, x_q, head_i8, "nearest")
    a = CFG.anchors_per_scale
    anchors = np.asarray(CFG.anchor_size, np.float64).ravel()
    extra = [
        f"#define N_ANCHORS {a}",
        f"#define N_CLASSES {CFG.num_classes}",
        f"#define STRIDE {CFG.strides[0]}",
        f"#define CONF_THRESH {CONF_THRESH}",
        f"#define NMS_THRESH {NMS_THRESH}",
        "static const double anchors[] = {%s};"
        % ", ".join(repr(float(v)) for v in anchors),
        "static const int exp_count[] = {%s};"
        % ", ".join(str(len(d[0])) for d in dets),
        "static const double exp_boxes[] = {%s};"
        % ", ".join(repr(float(v))
                    for d in dets for v in np.asarray(d[0]).ravel()),
        "static const double exp_scores[] = {%s};"
        % ", ".join(repr(float(v)) for d in dets for v in d[1]),
        "static const int exp_cls[] = {%s};"
        % ", ".join(str(int(v)) for d in dets for v in d[2]),
    ]
    with open(tmp_path / "model.h", "a") as f:
        f.write("\n".join(extra) + "\n")

    root = pathlib.Path(__file__).resolve().parents[1]
    exe = tmp_path / "pipeline"
    subprocess.run(
        [CC, "-O2", "-I", str(tmp_path), "-I", str(root / "native"),
         "-o", str(exe), str(root / "native" / "yolo_pipeline.c"), "-lm"],
        check=True, capture_output=True, text=True)
    res = subprocess.run([str(exe)], capture_output=True, text=True)
    assert res.returncode == 0, (
        f"C pipeline detections diverged:\n{res.stdout}{res.stderr}")
