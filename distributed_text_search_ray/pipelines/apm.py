"""Distributed approximate-pattern-match counts — the reference kernel on Ray.

Reproduces the reference's observable result exactly (per-document; SURVEY.md
section 8): for each pattern ``p`` with bound ``k``, the number of positions
``j`` whose window ``T[j : j+min(m, N-j)]`` is within truncated-window
Levenshtein distance ``k`` (``src/apm1.c:235-281``), summed over documents.
Duplicate patterns are counted independently (``script.sh:11``) and result
rows follow the query ids (argv order analog, ``src/apm1.c:294-299``).

Shape: stateless ``map_batches`` scan over document batches (the OpenMP
position loop M4, ``src/flexible_mpi.c:476-525``, becomes one Ray task per
block) emitting per-batch partial counts, then a tiny
``groupby(query_id).sum`` — the partial+final aggregate the reference does
with ``omp atomic`` + ``MPI_Reduce`` (``src/flexible_mpi.c:487-544``).
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from distributed_text_search_ray.functions.lev import windowed_match_count_many
from distributed_text_search_ray.util import resolve_concurrency


class ApmScan:
    """Actor-pool stage: patterns held once per actor (the broadcast side)."""

    def __init__(self, patterns: list[tuple[int, str, int]], text_column: str = "content"):
        self.patterns = patterns
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        qids, counts = [], []
        for qid, pattern, k in self.patterns:
            qids.append(qid)
            counts.append(windowed_match_count_many(texts, pattern, k))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "n_partial": pa.array(counts, type=pa.int64()),
            }
        )


def windowed_match_counts(
    docs: ray.data.Dataset | str,
    patterns: Iterable[tuple[int, str, int]],
    text_column: str = "content",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """(query_id, n_matches) for each (query_id, pattern, k)."""
    if isinstance(docs, str):
        from distributed_text_search_ray.sources.corpus import read_corpus

        docs = read_corpus(docs, columns=[text_column])
    pats = [(int(q), str(p), int(k)) for q, p, k in patterns]
    partials = docs.map_batches(
        ApmScan,
        fn_constructor_kwargs={"patterns": pats, "text_column": text_column},
        batch_format="pyarrow",
        concurrency=resolve_concurrency(concurrency),
    )
    out = partials.groupby("query_id").aggregate(Sum("n_partial", alias_name="n_matches"))
    return out
