"""Numeric helpers for SQL-parity outputs.

``round_half_up`` matches DuckDB's ROUND (half away from zero for
positive values), unlike ``np.round`` (half to even): 0.03125 rounds to
0.0313 in DuckDB but 0.0312 under banker's rounding. Every pipeline
column that is value-hash-compared against a DuckDB oracle uses this.
"""

from __future__ import annotations

import numpy as np


def round_half_up(x, digits: int):
    """Element-wise round-half-away-from-zero to ``digits`` decimals."""
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
