#!/usr/bin/env python
"""Thesis chart generation from tfevents across run dirs
(reference: paper_visualize.py -> experiment1.pdf / experiment1b.pdf /
experiment2.pdf).

Reads metric tags (e.g. ``metrics_y_hat/linear_rmse``) from multiple run
workspaces and renders comparison figures. Tag taxonomy matches what
hemx's paper models emit (see hemx/models/paper_family.py summaries)."""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from hemx.summaries.reader import get_all_events, get_tag_values
from hemx.utils.terminal import message

DEFAULT_METRICS = ["linear_rmse", "log_rmse", "abs_rel_diff",
                   "scale_invariant_log_rmse", "t1", "t2", "t3"]


def find_metric_tags(run_dir: str, phase: str = "train") -> list[str]:
    return [t for t in get_all_events(os.path.join(run_dir, phase))
            if t.startswith("metrics_")]


def render_experiment(run_dirs: list[str], metrics: list[str], out: str,
                      variant: str = "y_hat", phase: str = "train") -> int:
    n = len(metrics)
    ncols = min(n, 3)
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 3.5 * nrows),
                             squeeze=False)
    plotted = 0
    # one event-file parse per run (get_tag_values per metric would
    # re-parse the same logdir len(metrics) times)
    events_by_run = {r: get_all_events(os.path.join(r, phase))
                     for r in run_dirs}
    for i, metric in enumerate(metrics):
        ax = axes[i // ncols][i % ncols]
        for run_dir in run_dirs:
            tag = f"metrics_{variant}/{metric}"
            series = get_tag_values(os.path.join(run_dir, phase), tag,
                                    events=events_by_run[run_dir])
            if not series:
                continue
            ax.plot([s for s, _ in series], [v for _, v in series],
                    label=os.path.basename(os.path.normpath(run_dir)))
            plotted += 1
        ax.set_title(metric)
        ax.grid(alpha=0.3)
        if i == 0:
            ax.legend(fontsize=7)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    fig.savefig(out, bbox_inches="tight")
    plt.close(fig)
    return plotted


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="hemx thesis chart renderer")
    parser.add_argument("dirs", nargs="+", help="Run workspace dirs.")
    parser.add_argument("--metrics", nargs="*", default=DEFAULT_METRICS)
    parser.add_argument("--variant", default="y_hat",
                        choices=["y_hat", "y_0", "y_mean", "y_sampler"])
    parser.add_argument("--phase", default="train")
    parser.add_argument("--out", default="experiment.pdf")
    a = parser.parse_args(argv)

    n = render_experiment(a.dirs, a.metrics, a.out, a.variant, a.phase)
    if n == 0:
        avail = sorted({t for d in a.dirs
                        for t in find_metric_tags(d, a.phase)})
        message("no metric series found (train the paper_* models first)"
                + (f"; available metric tags: {', '.join(avail)}"
                   if avail else ""), "warning")
        return 1
    message(f"wrote {a.out} ({n} series)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
