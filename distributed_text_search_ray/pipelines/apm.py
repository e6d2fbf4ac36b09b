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

from distributed_text_search_ray.functions.lev import (
    windowed_match_count_many,
    windowed_match_counts_multi,
)
from distributed_text_search_ray.util import resolve_concurrency


class ApmScan:
    """Actor-pool stage: patterns held once per actor (the broadcast side)."""

    def __init__(self, patterns: list[tuple[int, str, int]], text_column: str = "content"):
        self.patterns = patterns
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        got = windowed_match_counts_multi(texts, self.patterns)
        qids = [q for q, _, _ in self.patterns]
        counts = [got[q] for q in qids]
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
    # 2-D decomposition (the reference's DISTRIBUTE_PATTERNS strategy,
    # src/flexible_mpi.c:154-190): when the pattern set is large and the
    # corpus is small (the reference's S1000 / weak-scaling regime), broadcast
    # the documents ONCE (ray.put) and make pattern-chunks the dataset --
    # parallelism = n_chunks, zero shuffle. Otherwise one scan stage over the
    # doc stream with partial counts + groupby-sum (the large-corpus regime).
    try:
        approx_bytes = docs.size_bytes()
    except Exception:
        approx_bytes = None
    if len(pats) > 64 and approx_bytes is not None and approx_bytes < 256 * 1024 * 1024:
        import ray as _ray

        texts = [
            r[text_column] for r in docs.select_columns([text_column]).take_all()
        ]
        texts_ref = _ray.put(texts)
        try:
            import ray as _r
            ncpu = int(_r.cluster_resources().get("CPU", 8))
        except Exception:
            ncpu = 8
        # small chunks maximize task parallelism; the multi-lane DP already
        # amortizes numpy dispatch within a chunk
        chunk_size = max(4, len(pats) // (2 * ncpu))
        items = [
            {
                "qids": [int(q) for q, _, _ in pats[i : i + chunk_size]],
                "pats": [p for _, p, _ in pats[i : i + chunk_size]],
                "ks": [int(k) for _, _, k in pats[i : i + chunk_size]],
            }
            for i in range(0, len(pats), chunk_size)
        ]

        def scan_chunk(batch: pa.Table) -> pa.Table:
            docs_local = _ray.get(texts_ref)
            qids, counts = [], []
            for row in batch.to_pylist():
                chunk = list(zip(row["qids"], row["pats"], row["ks"]))
                got = windowed_match_counts_multi(docs_local, chunk)
                for q, _, _ in chunk:
                    qids.append(int(q))
                    counts.append(got[q])
            return pa.table(
                {
                    "query_id": pa.array(qids, type=pa.int64()),
                    "n_matches": pa.array(counts, type=pa.int64()),
                }
            )

        return ray.data.from_items(items).map_batches(
            scan_chunk, batch_size=1, batch_format="pyarrow"
        )

    scan = ApmScan(patterns=pats, text_column=text_column)

    def apm_scan(batch: pa.Table) -> pa.Table:
        return scan(batch)

    partials = docs.map_batches(apm_scan, batch_format="pyarrow")
    out = partials.groupby("query_id").aggregate(
        Sum("n_partial", alias_name="n_matches")
    )
    return out
