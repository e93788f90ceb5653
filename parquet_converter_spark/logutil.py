"""Logging + run-summary rendering — reference parity for
/root/reference/parquet_converter/logging.py:60-170 (setup_logging:
console + optional file handlers, verbose→DEBUG; format_stats_table:
per-run textual table).

Differences forced by the CLI contract: the console handler writes to
STDERR (the CLI's stdout is a machine-readable JSON line that scripts
parse), and the stats grid is rendered without the tabulate dependency.
"""

from __future__ import annotations

import logging
import os
import sys

PKG_LOGGER = "parquet_converter_spark"


def setup_logging(
    level: str = "INFO", log_file: str | None = None, verbose: bool = False
) -> logging.Logger:
    """Configure the package logger: a stderr console handler and an
    optional file handler. Idempotent — handlers are replaced, not
    stacked, so repeated CLI invocations in one process don't
    double-log."""
    numeric = getattr(logging, level.upper(), None)
    if not isinstance(numeric, int):
        raise ValueError(f"invalid log level: {level!r}")
    eff = logging.DEBUG if verbose else numeric

    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    logger = logging.getLogger(PKG_LOGGER)
    logger.setLevel(eff)
    logger.propagate = False
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()

    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(fmt)
    console.setLevel(eff)
    logger.addHandler(console)

    if log_file:
        parent = os.path.dirname(log_file)
        if parent:
            os.makedirs(parent, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        fh.setLevel(numeric)
        logger.addHandler(fh)
    return logger


def get_logger(name: str | None = None) -> logging.Logger:
    return logging.getLogger(f"{PKG_LOGGER}.{name}" if name else PKG_LOGGER)


def format_stats_table(rows: list[dict], headers: list[str] | None = None) -> str:
    """Plain-text grid of per-run summaries (reference
    format_stats_table, logging.py:136-170). ``rows`` are dicts; the
    column order follows ``headers`` or the first row's keys."""
    if not rows:
        return "No runs."
    cols = headers or list(rows[0].keys())
    table = [[str(r.get(c, "")) for c in cols] for r in rows]
    widths = [max(len(c), *(len(row[i]) for row in table)) for i, c in enumerate(cols)]

    def line(ch: str = "-", junc: str = "+") -> str:
        return junc + junc.join(ch * (w + 2) for w in widths) + junc

    def render(cells: list[str]) -> str:
        return "| " + " | ".join(c.ljust(w) for c, w in zip(cells, widths)) + " |"

    out = [line("="), render(cols), line("=")]
    for row in table:
        out.append(render(row))
        out.append(line())
    return "\n".join(out)
