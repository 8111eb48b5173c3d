"""Overflow fault-detection (find-mode equivalent) + profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.config import get_config
from yolo_tpu.models import slim_yolo_v2
from yolo_tpu.quant import fixed_point as fp
from yolo_tpu.quant.int8_graph import quantize_pipeline


def _int8_model(rng, retune_bump=0):
    cfg = get_config("slim_yolo_v2", "mask", input_size=(32, 32))
    params = slim_yolo_v2.init_params(jax.random.PRNGKey(0), cfg,
                                      batch_norm=True)
    batches = [rng.random((2, 32, 32, 3), dtype=np.float32)]
    m = quantize_pipeline(params, cfg, batches)
    if retune_bump:
        m.retune.update({k: v + retune_bump for k, v in m.retune.items()})
    return m, batches


def test_no_overflow_with_searched_retune(rng):
    m, batches = _int8_model(rng)
    x_q = fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"])
    head, overflow = fp.int8_forward_diagnostics(m, x_q)
    assert all(int(v) == 0 for v in overflow.values())
    # diagnostics path computes the same head as the plain path
    np.testing.assert_array_equal(
        np.asarray(head), np.asarray(fp.int8_forward(m, x_q)))


def test_overflow_detected_with_bad_retune(rng):
    """Bumping retune shifts past the searched headroom must trip the
    detector (the failure the reference's asserts crash on)."""
    m, batches = _int8_model(rng, retune_bump=4)
    x_q = fp.quantize_input(jnp.asarray(batches[0]), m.sa["in"])
    _, overflow = fp.int8_forward_diagnostics(m, x_q)
    assert any(int(v) > 0 for v in overflow.values())


def test_metrics_logger(tmp_path):
    from yolo_tpu.utils.profiling import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path, echo=False)
    log.log(1, loss=2.5, lr=1e-3)
    log.log(2, loss=2.0, lr=1e-3)
    log.close()
    import json
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["step"] == 1 and lines[1]["loss"] == 2.0


def test_count_flops():
    from yolo_tpu.utils.profiling import count_flops

    def f(x):
        return x @ x

    x = np.zeros((64, 64), np.float32)
    cost = count_flops(f, x)
    assert cost["flops"] >= 2 * 64 ** 3 * 0.9
