"""ANSI terminal helpers (reference: hem/util/debug.py, util.py:322-336)."""

from __future__ import annotations

import shutil
import sys

RESET = "\033[0m"
BOLD = "\033[1m"
RED = "\033[31m"
GREEN = "\033[32m"
YELLOW = "\033[33m"
BLUE = "\033[34m"
CYAN = "\033[36m"

INFO = "info"
WARNING = "warning"
ERROR = "error"

_STYLE = {INFO: GREEN, WARNING: YELLOW, ERROR: RED}


def format_for_terminal(text: str, format_style: str = INFO) -> str:
    color = _STYLE.get(format_style, GREEN)
    return f"{BOLD}{color}{text}{RESET}"


def message(text: str, format_style: str = INFO, stream=None) -> None:
    stream = stream or sys.stdout
    if stream.isatty():
        print(format_for_terminal(text, format_style), file=stream)
    else:
        print(text, file=stream)


def terminal_width(default: int = 80) -> int:
    return shutil.get_terminal_size((default, 24)).columns


class MovingAverage:
    """Exponential-free running mean of a dict of scalars
    (reference: hem/util/misc.py:62-69 update_moving_average)."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    def update(self, values: dict) -> dict:
        # per-key counts: a metric present only on some update() calls
        # (conditional sub-phase losses) averages over ITS observations,
        # not the global call count
        for k, v in values.items():
            self.totals[k] = self.totals.get(k, 0.0) + float(v)
            self.counts[k] = self.counts.get(k, 0) + 1
        return {k: t / self.counts[k] for k, t in self.totals.items()}


def delta_postfix(values: dict, prev: dict) -> dict:
    """Render loss values with the v1 +/-/~ rose/fell/flat marker vs the
    previously displayed values (reference: util.py:196-212
    format_for_terminal; first display has no marker)."""
    out = {}
    for k, v in values.items():
        if k not in prev:
            out[k] = f"{v:.4g}"
            continue
        diff = float(v) - float(prev[k])
        sym = "+" if diff > 0 else "-" if diff < 0 else "~"
        out[k] = f"{v:.4g}({sym})"
    return out
