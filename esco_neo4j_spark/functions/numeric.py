"""Driver-side numeric helpers shared across plans and operators.

The correctness gate hashes exact values, so every driver-side rounding
must match the DuckDB oracle's ``round()`` (half away from zero).
Python's builtin ``round`` is banker's half-even and can flip the last
digit on exact .5 boundaries.
"""
from __future__ import annotations

import math


def round6(x: float) -> float:
    """floor(x*1e6 + 0.5)/1e6 — half-up 6dp rounding, matching DuckDB's
    and Spark's ``round(val, 6)`` on non-negative values (and the usual
    SQL half-away-from-zero on negatives via the sign split)."""
    if x < 0:
        return -math.floor(-x * 1e6 + 0.5) / 1e6
    return math.floor(x * 1e6 + 0.5) / 1e6
