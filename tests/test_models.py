"""Model-family structural tests: output shapes, parameter counts, and
train-mode BN threading across all five architectures."""

import jax
import numpy as np
import pytest

from yolo_tpu import detector as det
from yolo_tpu.config import get_config
from yolo_tpu.detector import Detector
from yolo_tpu.ops.blocks import count_params

# (model, dataset, input, expected param count, expected N predictions)
CASES = [
    ("slim_yolo_v2", "mask", (64, 64), None, (64 // 16) ** 2 * 5),
    ("yolo_v2", "voc", (64, 64), 50_676_061, (64 // 32) ** 2 * 5),
    ("tiny_yolo_v3", "voc", (64, 64), 10_817_286,
     (64 // 16) ** 2 * 3 + (64 // 32) ** 2 * 3),
    ("yolo_v3", "voc", (64, 64), 61_678_657,
     sum((64 // s) ** 2 * 3 for s in (8, 16, 32))),
    ("yolo_v3_spp", "voc", (64, 64), 63_251_521,
     sum((64 // s) ** 2 * 3 for s in (8, 16, 32))),
]


@pytest.mark.parametrize("name,dataset,size,n_params,n_preds", CASES)
def test_model_shapes_and_params(name, dataset, size, n_params, n_preds):
    cfg = get_config(name, dataset, input_size=size)
    d = Detector(cfg)
    params = d.init_params(jax.random.PRNGKey(0))
    if n_params is not None:
        assert count_params(params) == n_params
    x = np.zeros((1, *size, 3), np.float32)
    boxes, probs = det.predict(d.module, params, x, cfg)
    assert boxes.shape == (1, n_preds, 4)
    assert probs.shape == (1, n_preds, cfg.num_classes)
    assert np.isfinite(np.asarray(probs)).all()
    assert (np.asarray(boxes) >= 0).all() and (np.asarray(boxes) <= 1).all()


def test_tiny_yolo_v3_train_mode_threads_bn():
    cfg = get_config("tiny_yolo_v3", "voc", input_size=(64, 64))
    d = Detector(cfg)
    params = d.init_params(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).random((2, 64, 64, 3), dtype=np.float32)
    (conf, cls, txt, boxes), new_params = det.train_outputs(
        d.module, params, x, cfg)
    n = sum((64 // s) ** 2 * 3 for s in (16, 32))
    assert conf.shape == (2, n, 1)
    # BN running stats must have moved
    old = params["backbone"]["conv_1"][0]["bn"]["mean"]
    new = new_params["backbone"]["conv_1"][0]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
