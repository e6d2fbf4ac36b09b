"""Sequence packing: assemble documents into fixed-token-budget training
packs (the "concat-and-chunk" / greedy-fill step every LLM pre-training
pipeline runs after filtering and dedup).

Semantics (deterministic, independent of Ray block structure):

- Documents are processed in ascending ``doc_id`` order inside fixed
  ``range_size``-wide doc_id ranges (``range_id = doc_id // range_size``).
- Within a range, greedy sequential fill: a doc joins the current pack if
  its (possibly truncated) token count still fits ``max_tokens``; otherwise
  it starts a new pack. A doc longer than ``max_tokens`` occupies a pack of
  its own with ``truncated = True`` and contributes exactly ``max_tokens``.
- ``pack_id = range_id * 2**32 + local_pack_index`` — globally unique and
  stable under any re-partitioning of the input.

Scale shape: token counting is a single-pass ``map_batches``; the packing
itself is ``groupby(range_id).map_groups`` — per-range state (the running
fill level) never leaves one group, and each group is bounded by
``range_size`` rows, so the stage is embarrassingly parallel across ranges
at any corpus size. Packing is inherently sequential ONLY within a range;
the range boundary is the documented parallelism/packing-quality trade
(a pack never spans two ranges, so up to one pack per range is underfull
beyond what a global sequential pass would produce).

Not SQL-expressible (the greedy reset is a running-state scan), so the
driver records a rows-only check; exactness is pinned by a pure-Python
differential oracle in tests/test_extras.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from distributed_text_search_ray.config import AnalyzerConfig
from distributed_text_search_ray.functions.tokenize import tokenizer_for


def pack_greedy(doc_ids, n_tokens, max_tokens: int):
    """Pure greedy fill over (doc_id-sorted) arrays; returns
    (local_pack, pack_pos, packed_tokens, truncated) arrays.

    Shared by the distributed stage (per range) and the test oracle (whole
    corpus, range_size=inf) — the differential test then checks the stage
    against this same function applied per range, and the semantics
    against a global pass.
    """
    order = np.argsort(doc_ids, kind="stable")
    packs = np.empty(len(order), dtype=np.int64)
    pos = np.empty(len(order), dtype=np.int64)
    kept = np.empty(len(order), dtype=np.int64)
    trunc = np.empty(len(order), dtype=bool)
    cur_pack, cur_fill, cur_pos = 0, 0, 0
    for k, idx in enumerate(order):
        m = int(n_tokens[idx])
        t = m > max_tokens
        if t:
            m = max_tokens
        if k > 0 and cur_fill + m > max_tokens:
            cur_pack += 1
            cur_fill, cur_pos = 0, 0
        packs[idx] = cur_pack
        pos[idx] = cur_pos
        kept[idx] = m
        trunc[idx] = t
        cur_fill += m
        cur_pos += 1
    return packs, pos, kept, trunc


def pack_sequences(
    docs: ray.data.Dataset,
    max_tokens: int = 512,
    range_size: int = 100_000,
    analyzer: AnalyzerConfig | None = None,
) -> ray.data.Dataset:
    """(doc_id, pack_id, pack_pos, n_tokens, packed_tokens, truncated) —
    the pack assignment for every document. A downstream writer groups by
    ``pack_id`` to emit actual token streams; emitting assignments (not
    concatenated text) keeps the operator's output small and joinable.
    """

    def count_tokens(batch: pa.Table) -> pa.Table:
        tk = tokenizer_for(analyzer)
        ids = batch.column("doc_id").to_numpy()
        n = [tk.token_count(t) for t in batch.column("content").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "range_id": pa.array(ids // range_size, type=pa.int64()),
                "n_tokens": pa.array(n, type=pa.int64()),
            }
        )

    def pack_range(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy()
        n = group.column("n_tokens").to_numpy()
        rid = int(group.column("range_id")[0].as_py())
        packs, pos, kept, trunc = pack_greedy(ids, n, max_tokens)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "pack_id": pa.array(rid * (1 << 32) + packs, type=pa.int64()),
                "pack_pos": pa.array(pos, type=pa.int64()),
                "n_tokens": pa.array(n, type=pa.int64()),
                "packed_tokens": pa.array(kept, type=pa.int64()),
                "truncated": pa.array(trunc, type=pa.bool_()),
            }
        )

    return (
        docs.map_batches(count_tokens, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(pack_range, batch_format="pyarrow")
    )
