"""BM25 scoring (Robertson/Sparck-Jones variant used by Lucene).

idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))
score(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

Determinism contract (SURVEY.md section 7 "hard parts"): all arithmetic in
float64; a query's per-term contributions are summed in ascending term order
both here and in the single-node oracle, so engine and oracle scores are
bit-identical.
"""

from __future__ import annotations

import math

import numpy as np


def idf(N: int, df: np.ndarray | int) -> np.ndarray | float:
    if np.isscalar(df) or isinstance(df, int):
        return math.log(1.0 + (N - df + 0.5) / (df + 0.5))
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (N - df + 0.5) / (df + 0.5))


def tf_part(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = 1.2, b: float = 0.75
) -> np.ndarray:
    """Term-frequency saturation component, vectorized over postings."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def score_postings(
    tf: np.ndarray,
    dl: np.ndarray,
    N: int,
    df: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> np.ndarray:
    return idf(N, df) * tf_part(tf, dl, avgdl, k1, b)
