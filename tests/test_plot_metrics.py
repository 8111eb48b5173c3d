"""scripts/plot_metrics.py: metrics.jsonl -> PNG training curves (the
TensorBoard-scalar equivalent, reference train.py:223-230)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))


def _write_log(path, with_map=True):
    with open(path, "w") as f:
        for i in range(20):
            f.write(json.dumps({
                "step": i, "time": 0.0, "lr": 1e-3,
                "total_loss": 10.0 / (1 + i), "conf_loss": 5.0 / (1 + i),
                "cls_loss": 3.0 / (1 + i),
                "txtytwth_loss": 2.0 / (1 + i)}) + "\n")
        if with_map:
            f.write(json.dumps({"step": 19, "time": 0.0,
                                "mAP": 0.4}) + "\n")


def test_load_metrics_series(tmp_path):
    from plot_metrics import load_metrics

    log = tmp_path / "metrics.jsonl"
    _write_log(log)
    m = load_metrics(str(log))
    assert set(m) == {"lr", "total_loss", "conf_loss", "cls_loss",
                      "txtytwth_loss", "mAP"}
    steps, vals = m["total_loss"]
    assert steps == tuple(range(20))
    assert vals[0] == 10.0 and vals[-1] == 0.5
    assert m["mAP"] == ((19,), (0.4,))


def test_plot_writes_png(tmp_path):
    from plot_metrics import plot

    log = tmp_path / "metrics.jsonl"
    _write_log(log)
    out = tmp_path / "curves.png"
    plot([str(log)], str(out))
    assert out.stat().st_size > 10_000


def test_cli_main(tmp_path):
    from plot_metrics import main

    log = tmp_path / "metrics.jsonl"
    _write_log(log, with_map=False)
    out = tmp_path / "o.png"
    main([str(log), "-o", str(out)])
    assert out.exists()
