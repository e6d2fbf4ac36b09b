"""Small shared helpers."""

from __future__ import annotations

import math

import numpy as np


def round_half_away(x, ndigits: int = 6):
    """Round half away from zero, the way DuckDB's ROUND does (round(x*10^n)
    / 10^n in float64) — NOT Python's banker's rounding. Used for every float
    column that a SQL oracle reproduces, so both sides emit identical doubles.
    Accepts scalars or numpy arrays."""
    p = 10.0**ndigits
    if isinstance(x, np.ndarray):
        return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p
    return math.copysign(math.floor(abs(x) * p + 0.5) / p, x)


def resolve_concurrency(concurrency=None):
    """Default actor-pool sizing: autoscale between 1 and the cluster CPU
    count so a single stage never reserves every CPU (which would starve the
    read/write stages and serialize the pipeline)."""
    if concurrency is not None:
        return concurrency
    import ray

    try:
        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return (1, max(2, n))
