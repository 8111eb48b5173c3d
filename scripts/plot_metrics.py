"""Render metrics.jsonl training curves to PNG.

TPU-native substitute for the reference's optional TensorBoard scalars
(reference train.py:223-230 writes total/obj/cls/box loss): cli/train.py
logs the same scalars (plus LR and periodic mAP) to an append-only JSONL
via MetricsLogger; this script turns one or more such logs into a
loss/LR/mAP figure without a TensorBoard server.

Usage:
    python scripts/plot_metrics.py run/mask/slim_yolo_v2/metrics.jsonl \
        [more.jsonl ...] [-o curves.png]
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def load_metrics(path):
    """JSONL -> {scalar_name: (steps, values)}, sorted by step."""
    series = defaultdict(list)
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = rec.get("step", 0)
            for k, v in rec.items():
                if k in ("step", "time"):
                    continue
                series[k].append((step, v))
    return {k: tuple(zip(*sorted(v))) for k, v in series.items()}


LOSS_KEYS = ("total_loss", "conf_loss", "cls_loss", "txtytwth_loss")


def plot(paths, out_path, ema: float = 0.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = {os.path.basename(os.path.dirname(p)) or p: load_metrics(p)
            for p in paths}
    panels = [("loss", LOSS_KEYS), ("lr", ("lr",)), ("mAP", ("mAP",))]
    panels = [(t, [k for k in ks if any(k in m for m in runs.values())])
              for t, ks in panels]
    panels = [(t, ks) for t, ks in panels if ks]
    if not panels:
        raise SystemExit("no plottable scalars found")

    fig, axes = plt.subplots(1, len(panels),
                             figsize=(5.2 * len(panels), 3.8))
    if len(panels) == 1:
        axes = [axes]
    for ax, (title, keys) in zip(axes, panels):
        for run, metrics in runs.items():
            for k in keys:
                if k not in metrics:
                    continue
                steps, vals = metrics[k]
                if ema > 0 and len(vals) > 2:
                    sm, prev = [], vals[0]
                    for v in vals:
                        prev = ema * prev + (1 - ema) * v
                        sm.append(prev)
                    vals = sm
                label = k if len(runs) == 1 else f"{run}:{k}"
                style = "o-" if k == "mAP" else "-"
                ax.plot(steps, vals, style, label=label, linewidth=1.2,
                        markersize=3)
        ax.set_title(title)
        ax.set_xlabel("step")
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=8)
        if title == "loss":
            ax.set_yscale("log")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("logs", nargs="+", help="metrics.jsonl path(s)")
    p.add_argument("-o", "--out", default="metrics.png")
    p.add_argument("--ema", type=float, default=0.6,
                   help="loss smoothing factor (0 = raw)")
    a = p.parse_args(argv)
    plot(a.logs, a.out, a.ema)


if __name__ == "__main__":
    main()
