#!/usr/bin/env python
"""Run browser (reference: visualize_gui.py — a wxPython TensorBoard-events
tree browser).

The wx frontend is NOT implemented (wxPython is not part of this
environment); this tool provides an interactive terminal browser over the
same data instead: list workspace runs, their checkpoints and scalar tags,
and render any tag to a PNG chart. If wxPython is importable we say so and
still use the terminal browser.
"""

from __future__ import annotations

import argparse
import os
import sys

from hemx.summaries.reader import get_all_events, get_tag_values
from hemx.train.checkpoint import CheckpointManager
from hemx.utils.terminal import message


def discover_runs(workspace: str) -> list[str]:
    runs = []
    for root, dirs, files in os.walk(workspace):
        if "options.config" in files or any(
                d in dirs for d in ("train", "validate")):
            runs.append(root)
            dirs.clear()
    return sorted(runs)


def describe_run(run_dir: str) -> None:
    print(f"\n== {run_dir}")
    ckpts = CheckpointManager(run_dir).checkpoints()
    print(f"   checkpoints: {[e for e, _ in ckpts]}")
    for phase in ("train", "validate", "test"):
        tags = sorted(get_all_events(os.path.join(run_dir, phase)))
        if tags:
            print(f"   {phase} tags: {', '.join(tags[:12])}"
                  + (" ..." if len(tags) > 12 else ""))


def plot_tag(run_dir: str, phase: str, tag: str, out: str) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = get_tag_values(os.path.join(run_dir, phase), tag)
    if not series:
        message(f"no data for {phase}/{tag}", "warning")
        return
    fig, ax = plt.subplots(figsize=(8, 4.5))
    ax.plot([s for s, _ in series], [v for _, v in series])
    ax.set_title(f"{os.path.basename(run_dir)} {phase}/{tag}")
    ax.set_xlabel("step")
    ax.grid(alpha=0.3)
    fig.savefig(out, bbox_inches="tight")
    message(f"wrote {out}")


def tui(workspace: str) -> int:
    runs = discover_runs(workspace)
    if not runs:
        message(f"no runs under {workspace}", "warning")
        return 1
    for i, r in enumerate(runs):
        print(f"[{i}] {r}")
    try:
        while True:
            cmd = input("\n(run#, 'run# phase tag out.png' to plot, "
                        "q to quit)> ").strip()
            if cmd in ("q", "quit", ""):
                return 0
            parts = cmd.split()
            run = runs[int(parts[0])]
            if len(parts) == 1:
                describe_run(run)
            else:
                phase, tag = parts[1], parts[2]
                out = parts[3] if len(parts) > 3 else "tag.png"
                plot_tag(run, phase, tag, out)
    except (EOFError, KeyboardInterrupt):
        return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="hemx run browser")
    parser.add_argument("--workspace", default="workspace")
    parser.add_argument("--list", action="store_true",
                        help="Describe all runs and exit (non-interactive).")
    a = parser.parse_args(argv)
    try:
        import wx  # noqa: F401  (the reference GUI; not in this image)
        message("wxPython found but the wx frontend is not implemented in "
                "this environment; using the terminal browser.", "warning")
    except ImportError:
        pass
    if a.list:
        for run in discover_runs(a.workspace):
            describe_run(run)
        return 0
    return tui(a.workspace)


if __name__ == "__main__":
    sys.exit(main())
