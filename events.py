#!/usr/bin/env python
"""Standalone loss-curve plotter from tfevents (reference: events.py).

Renders train-vs-validate G/D (or any losses/*) curves for one or more runs
into a publication-style PDF/PNG."""

from __future__ import annotations

import argparse
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from hemx.summaries.reader import get_all_events
from hemx.utils.terminal import message


def plot_run(ax, run_dir: str, tags=None, phases=("train", "validate")):
    plotted = 0
    for phase in phases:
        events = get_all_events(os.path.join(run_dir, phase))
        for tag, rows in sorted(events.items()):
            if not tag.startswith("losses/"):
                continue
            short = tag.split("/", 1)[1]
            if tags and short not in tags:
                continue
            steps = [r[1] for r in rows]
            vals = [r[2] for r in rows]
            style = "-" if phase == "train" else "--"
            ax.plot(steps, vals, style,
                    label=f"{os.path.basename(run_dir)} {phase}/{short}")
            plotted += 1
    return plotted


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="hemx events plotter")
    parser.add_argument("dirs", nargs="+", help="Run workspace dirs.")
    parser.add_argument("--tags", nargs="*", default=None,
                        help="Loss names to include (default all).")
    parser.add_argument("--out", default="losses.pdf")
    parser.add_argument("--logy", action="store_true")
    parser.add_argument("--histogram", default=None, metavar="TAG",
                        help="Render TAG's histogram evolution as a "
                             "percentile-fan chart instead of loss curves "
                             "(reference: hem/util/events.py:120-205). "
                             "Use --histogram list to enumerate tags.")
    a = parser.parse_args(argv)

    if a.histogram:
        from hemx.summaries.reader import (get_histogram_tags,
                                           render_histogram_plot)
        run = os.path.join(a.dirs[0], "train")
        if a.histogram == "list":
            for t in get_histogram_tags(run):
                print(t)
            return 0
        out = a.out if a.out != "losses.pdf" else "histogram.png"
        render_histogram_plot(run, a.histogram, out)
        message(f"wrote {out}")
        return 0

    fig, ax = plt.subplots(figsize=(9, 5.5))
    total = 0
    for run_dir in a.dirs:
        total += plot_run(ax, run_dir, a.tags)
    if total == 0:
        message("no loss series found", "warning")
        return 1
    if a.logy:
        ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.savefig(a.out, bbox_inches="tight")
    message(f"wrote {a.out} ({total} series)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
