"""Phase-B tokenize stage: corpus shards -> posting-pair checkpoint files.

One work item per input corpus shard (parquet file). Each task streams its
shard's row groups through the analyzer and writes a pairs file
``(term, doc_id, tf, dl)`` plus a lineage manifest, atomically. A rerun skips
shards whose manifest matches the current corpus fingerprint — this is the
"resumes without re-tokenizing completed partitions" contract (north_rule).

Expressed as a Dataset pipeline (``from_items(shards) ->
map_batches(TokenizeShard, ...)``) so Ray's streaming executor handles
scheduling and backpressure; the per-shard granularity is what makes exact
resume possible (the reference analog: rank ``i`` owns ``dir/i.txt``,
``src/flexible_mpi.c:232-233`` — but shards here are decoupled from workers).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.functions.hashing import doc_fingerprint
from distributed_text_search_ray.functions.tokenize import Tokenizer, pairs_table
from distributed_text_search_ray.state import manifest as mf

PAIRS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("dl", pa.int64()),
    ]
)


class TokenizeShard:
    """Actor-pool stage: analyzer compiled once per actor (T1 analog —
    the reference allocates DP scratch once per thread,
    ``src/flexible_mpi.c:478-485``)."""

    def __init__(self, pairs_dir: str, fingerprint: str, cfg: IndexConfig):
        self.pairs_dir = pairs_dir
        self.fingerprint = fingerprint
        self.cfg = cfg
        self.tokenizer = Tokenizer(cfg.analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("shard_id", "n_docs", "n_tokens", "n_pairs", "skipped")}
        for row in batch.to_pylist():
            res = self._process_shard(row["shard_id"], row["file"])
            for k in out:
                out[k].append(res[k])
        return pa.table(out)

    def _process_shard(self, shard_id: int, file: str) -> dict:
        out_dir = os.path.join(self.pairs_dir, f"shard={shard_id:05d}")
        existing = mf.read_manifest(out_dir)
        if existing is not None and existing.get("fingerprint") == self.fingerprint:
            return {
                "shard_id": shard_id,
                "n_docs": existing["n_docs"],
                "n_tokens": existing["n_tokens"],
                "n_pairs": existing["n_pairs"],
                "skipped": True,
            }
        n_docs = n_tokens = n_pairs = 0
        pf = pq.ParquetFile(file)
        has_doc_id = "doc_id" in pf.schema_arrow.names
        cols = (["doc_id"] if has_doc_id else ["repo", "path"]) + ["content"]
        with mf.AtomicDir(out_dir) as tmp:
            writer = pq.ParquetWriter(os.path.join(tmp, "pairs.parquet"), PAIRS_SCHEMA)
            for rb in pf.iter_batches(batch_size=8192, columns=cols):
                t = pa.Table.from_batches([rb])
                texts = t.column("content").to_pylist()
                if has_doc_id:
                    ids = t.column("doc_id").to_numpy()
                else:
                    ids = np.fromiter(
                        (
                            doc_fingerprint(r, p)
                            for r, p in zip(
                                t.column("repo").to_pylist(), t.column("path").to_pylist()
                            )
                        ),
                        dtype=np.int64,
                        count=len(t),
                    )
                terms, pdoc, tfs, dls, counts = self.tokenizer.batch_pairs(ids, texts)
                writer.write_table(pairs_table(terms, pdoc, tfs, dls))
                n_docs += len(texts)
                n_tokens += int(counts.sum())
                n_pairs += len(terms)
            writer.close()
            mf.write_manifest(
                tmp,
                {
                    "kind": "pairs_shard",
                    "shard_id": shard_id,
                    "input_file": os.path.basename(file),
                    "fingerprint": self.fingerprint,
                    "n_docs": n_docs,
                    "n_tokens": n_tokens,
                    "n_pairs": n_pairs,
                },
            )
        return {
            "shard_id": shard_id,
            "n_docs": n_docs,
            "n_tokens": n_tokens,
            "n_pairs": n_pairs,
            "skipped": False,
        }
