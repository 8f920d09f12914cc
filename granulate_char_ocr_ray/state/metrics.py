"""Structured pipeline observability: parse ``Dataset.stats()`` into a
per-operator metrics table — the programmatic surface a job harness
needs (alert on a stage whose wall time or spill dominates) instead of
the human-readable blob. Complements the per-partition lineage metrics
the checkpoint writer records (state/checkpoint.py); reference prints
ad-hoc timings at evaluate_new_testdata.py:24-44.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_OP_RE = re.compile(
    r"^Operator (\d+) (.+?): (\d+) tasks executed, "
    r"(\d+) blocks produced in ([0-9.]+)s", re.M)
_ROWS_RE = re.compile(
    r"Output num rows per block: .*?([0-9.]+) total")
_BYTES_RE = re.compile(
    r"Output size bytes per block: .*?([0-9.]+) total")


def profile_stats(stats: str) -> pd.DataFrame:
    """Parse a ``Dataset.stats()`` string into one row per operator:
    (op_index, operator, tasks, blocks, wall_s, rows_out, bytes_out).
    rows/bytes are -1 when the section is absent (e.g. all-to-all
    operators report differently)."""
    rows = []
    matches = list(_OP_RE.finditer(stats))
    for i, m in enumerate(matches):
        start = m.end()
        end = matches[i + 1].start() if i + 1 < len(matches) else \
            len(stats)
        section = stats[start:end]
        rm = _ROWS_RE.search(section)
        bm = _BYTES_RE.search(section)
        rows.append((
            int(m.group(1)), m.group(2), int(m.group(3)),
            int(m.group(4)), float(m.group(5)),
            int(float(rm.group(1))) if rm else -1,
            int(float(bm.group(1))) if bm else -1))
    out = pd.DataFrame(rows, columns=[
        "op_index", "operator", "tasks", "blocks", "wall_s",
        "rows_out", "bytes_out"])
    for c in ("op_index", "tasks", "blocks", "rows_out", "bytes_out"):
        out[c] = out[c].astype(np.int64)
    return out


def profile_dataset(ds) -> pd.DataFrame:
    """Materialize ``ds`` (if needed) and return its operator profile.
    Call on a small/diagnostic run — materializing a 100-TB pipeline
    to profile it defeats the streaming executor; production jobs read
    the same numbers from the checkpoint lineage metrics instead."""
    return profile_stats(ds.materialize().stats())
