"""Phase-C segment build: pairs -> term-hash partitions -> posting segments.

The engine's one wide shuffle (SURVEY.md section 2.11): pairs get an explicit
``part`` column — ``hash(term) % P`` for normal terms, salted
``hash(term # doc_id % S) % P`` for heavy hitters (Zipfian code terms like
``def`` / ``import``; north_rule skew clause) — then
``groupby("part").map_groups(SegmentBuilder)`` encodes each partition into a
compressed posting segment written atomically with a lineage manifest.
Completed partitions are filtered out *before* the shuffle on resume, so their
pairs never move.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.functions.hashing import stable_u64, term_partition
from distributed_text_search_ray.state import manifest as mf
from distributed_text_search_ray.state.segment import build_segment_tables, write_segment


def salted_partition_table(hot_terms: list[str], cfg: IndexConfig) -> dict[str, np.ndarray]:
    """hot term -> array of the S partitions its salt buckets map to."""
    return {
        t: np.array(
            [
                stable_u64(f"{t}#{s}") % cfg.num_partitions
                for s in range(cfg.salt_buckets)
            ],
            dtype=np.int64,
        )
        for t in hot_terms
    }


class AssignPartitions:
    """map_batches stage adding the explicit shuffle key ``part``.

    ``hot_salt`` is the small broadcast side (built once per actor from the
    stats pass) — a lookup, not a shuffle join (SURVEY.md section 2.4).
    """

    def __init__(self, cfg: IndexConfig, hot_terms: list[str], skip_parts: list[int] | None = None):
        self.cfg = cfg
        self.hot_salt = salted_partition_table(hot_terms, cfg)
        self.skip = np.zeros(cfg.num_partitions, dtype=bool)
        for p in skip_parts or []:
            self.skip[p] = True
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
        uniq, inv = np.unique(terms, return_inverse=True)
        base = np.empty(len(uniq), dtype=np.int64)
        for i, t in enumerate(uniq):
            p = self._cache.get(t)
            if p is None:
                p = term_partition(t, self.cfg.num_partitions)
                self._cache[t] = p
            base[i] = p
        parts = base[inv]
        if self.hot_salt:
            doc_ids = batch.column("doc_id").to_numpy()
            for t, table in self.hot_salt.items():
                mask = terms == t
                if mask.any():
                    parts[mask] = table[doc_ids[mask] % self.cfg.salt_buckets]
        out = batch.append_column("part", pa.array(parts, type=pa.int64()))
        if self.skip.any():
            keep = ~self.skip[parts]
            out = out.filter(pa.array(keep))
        return out


class SegmentBuilder:
    """map_groups callable: one term-hash partition -> one segment on disk."""

    def __init__(
        self,
        index_dir: str,
        fingerprint: str,
        cfg: IndexConfig,
        N: int,
        avgdl: float,
    ):
        self.index_dir = index_dir
        self.fingerprint = fingerprint
        self.cfg = cfg
        self.N = N
        self.avgdl = avgdl

    def __call__(self, group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        seg_dir = os.path.join(self.index_dir, "segments", f"part={part:05d}")
        g = group.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        terms = np.asarray(g.column("term").to_pylist(), dtype=object)
        doc_ids = g.column("doc_id").to_numpy()
        tfs = g.column("tf").to_numpy()
        dls = g.column("dl").to_numpy()
        terms_table, docs_b, tfs_b, dls_b, stats = build_segment_tables(
            terms, doc_ids, tfs, dls, self.N, self.avgdl, self.cfg
        )
        with mf.AtomicDir(seg_dir) as tmp:
            checks = write_segment(tmp, terms_table, docs_b, tfs_b, dls_b)
            mf.write_manifest(
                tmp,
                {
                    "kind": "segment",
                    "part": part,
                    "fingerprint": self.fingerprint,
                    "checksums": checks,
                    **stats,
                },
            )
        return pa.table(
            {
                "part": pa.array([part], type=pa.int64()),
                "n_terms": pa.array([stats["n_terms"]], type=pa.int64()),
                "n_postings": pa.array([stats["n_postings"]], type=pa.int64()),
                "skipped": pa.array([False]),
            }
        )
