"""Phase-A tokenize+partition stage: corpus shards -> per-partition pair files.

One work item per input corpus shard (parquet file). Each task streams its
shard's row groups through the analyzer, assigns every ``(term, doc_id, tf,
dl)`` pair its explicit term-hash partition (salting heavy terms), and writes
ONE pairs file sorted by partition with parquet **row groups aligned to
partition boundaries**; the lineage manifest records part -> row-group
indices so segment builders read exactly their partition's bytes. This is deliberate map-side partitioning: the segment
builders then read exactly their partition's files, so the build needs NO
Ray all-to-all exchange (measured: Ray's sort-based groupby shuffle added a
~15 s serial component that capped 8->32-CPU scaling efficiency at ~0.5; the
explicit layout is embarrassingly parallel in both phases). The reference
analog of the exchange is the Isend/Recv byte-range exchange at
``src/flexible_mpi.c:398-447`` — there too the partitioning is computed
up front (``fill_data_bounds``) rather than discovered by a shuffle.

Skew (north_rule): a term whose document frequency within the shard exceeds
``salt_df_threshold`` of the shard's docs is salted — its pairs spread over
``salt_buckets`` partitions keyed by ``doc_id``. Shards may disagree on what
is hot; that is safe because each pair still lands in exactly one partition,
the query side probes base + salt partitions for any term the finalize step
saw in more than one partition, and exact global df for those terms is
re-aggregated at finalize.

A rerun skips shards whose manifest matches the shard's per-FILE fingerprint
— "resumes without re-tokenizing completed partitions", including after
appending new corpus files (only the new shards tokenize). Stale pair files
are ignored (phase B reads only manifest-listed row groups) and garbage-
collected by the next build.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.functions.hashing import doc_fingerprint, stable_u64, term_partition
from distributed_text_search_ray.functions.tokenize import Tokenizer, batch_pairs_dict
from distributed_text_search_ray.state import manifest as mf

PAIRS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int64()),
        ("dl", pa.int64()),
    ]
)
# positional builds (IndexConfig.store_positions) append a pos column:
# each pair's ascending token positions within its doc
PAIRS_SCHEMA_POS = PAIRS_SCHEMA.append(pa.field("pos", pa.list_(pa.int32())))


def shard_manifest_dir(pairs_dir: str) -> str:
    return os.path.join(pairs_dir, "manifests")


class TokenizeShard:
    """Per-shard tokenize + explicit partition + write (used as a plain
    task-pool function via a closure; construction is just a regex compile)."""

    def __init__(self, pairs_dir: str, fingerprint: str, cfg: IndexConfig):
        self.pairs_dir = pairs_dir
        self.fingerprint = fingerprint
        self.cfg = cfg
        self.tokenizer = Tokenizer(cfg.analyzer)
        self._part_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "shard_id": [], "n_docs": [], "n_tokens": [], "n_pairs": [], "skipped": [],
        }
        for row in batch.to_pylist():
            res = self._process_shard(row["shard_id"], row["file"])
            for k in out:
                out[k].append(res[k])
        return pa.table(out)

    # ---- internals ----

    def _assign_parts(
        self,
        codes: np.ndarray,
        dictionary: list[str],
        df: np.ndarray,
        doc_ids: np.ndarray,
        shard_docs: int,
    ) -> tuple[np.ndarray, list[str]]:
        """Partition id per pair row + the shard's salted-term list.

        ``codes``/``dictionary``: arrow dictionary encoding of the pair terms
        (only the vocabulary-sized dictionary touches Python); ``df``: per-
        dictionary-entry document frequency within this shard."""
        cfg = self.cfg
        base = np.empty(len(dictionary), dtype=np.int64)
        for i, t in enumerate(dictionary):
            p = self._part_cache.get(t)
            if p is None:
                p = term_partition(t, cfg.num_partitions)
                self._part_cache[t] = p
            base[i] = p
        parts = base[codes]
        hot_threshold = max(2.0, cfg.salt_df_threshold * shard_docs)
        salted = []
        for i in np.flatnonzero(df >= hot_threshold):
            t = dictionary[i]
            salted.append(t)
            table = np.array(
                [
                    stable_u64(f"{t}#{s}") % cfg.num_partitions
                    for s in range(cfg.salt_buckets)
                ],
                dtype=np.int64,
            )
            mask = codes == i
            parts[mask] = table[doc_ids[mask] % cfg.salt_buckets]
        return parts, salted

    def _process_shard(self, shard_id: int, file: str) -> dict:
        man_dir = shard_manifest_dir(self.pairs_dir)
        os.makedirs(man_dir, exist_ok=True)
        # keyed by file identity (not position): an appended corpus leaves
        # existing shards' manifests valid
        safe = mf.safe_name(file)
        shard_fp = mf.shard_fingerprint(file, self.cfg.fingerprint())
        man_path = os.path.join(man_dir, f"{safe}.json")
        existing = mf.read_manifest_file(man_path)
        if existing is not None and existing.get("shard_fp") == shard_fp:
            return {
                "shard_id": shard_id,
                "n_docs": existing["n_docs"],
                "n_tokens": existing["n_tokens"],
                "n_pairs": existing["n_pairs"],
                "skipped": True,
            }
        pf = pq.ParquetFile(file)
        has_doc_id = "doc_id" in pf.schema_arrow.names
        cols = (["doc_id"] if has_doc_id else ["repo", "path"]) + ["content"]
        # doc-attribute sidecar for filtered search: copy the configured
        # metadata columns (those present in this shard) alongside doc_id
        attr_cols = [
            c for c in tuple(self.cfg.attribute_columns) if c in pf.schema_arrow.names
        ]
        cols += attr_cols
        attr_id_chunks: list[np.ndarray] = []
        attr_val_chunks: dict[str, list[pa.Array]] = {c: [] for c in attr_cols}
        # Python strings live only within one chunk — each chunk is converted
        # to Arrow immediately, so a 32-task node never holds millions of
        # PyObjects concurrently (that allocator pressure halved tokenize
        # throughput at high parallelism)
        term_chunks: list[pa.Array] = []
        doc_chunks, tf_chunks, dl_chunks = [], [], []
        pos_chunks: list[pa.Array] = []
        n_docs = n_tokens = 0
        for rb in pf.iter_batches(batch_size=2048, columns=cols):
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
            if attr_cols:
                attr_id_chunks.append(np.asarray(ids, dtype=np.int64))
                for c in attr_cols:
                    attr_val_chunks[c].append(t.column(c).combine_chunks())
            if self.cfg.store_positions:
                terms, pdoc, tfs, dls, counts, pos = batch_pairs_dict(
                    self.tokenizer, ids, texts, with_positions=True
                )
                pos_chunks.append(pos)
            else:
                terms, pdoc, tfs, dls, counts = batch_pairs_dict(self.tokenizer, ids, texts)
            term_chunks.append(terms)
            doc_chunks.append(pdoc)
            tf_chunks.append(tfs)
            dl_chunks.append(dls)
            n_docs += len(texts)
            n_tokens += int(counts.sum())
        if term_chunks:
            # combine_chunks unifies the per-chunk dictionaries — the pair
            # stream never materializes per-pair Python/plain strings
            term_col = pa.chunked_array(term_chunks).combine_chunks()
            doc_ids = np.concatenate(doc_chunks)
            tfs = np.concatenate(tf_chunks)
            dls = np.concatenate(dl_chunks)
        else:
            term_col = pa.DictionaryArray.from_arrays(
                pa.array([], type=pa.int32()), pa.array([], type=pa.string())
            )
            doc_ids = tfs = dls = np.empty(0, np.int64)

        codes = term_col.indices.to_numpy() if len(term_col) else np.empty(0, np.int64)
        dictionary = term_col.dictionary.to_pylist()
        # per-pair rows are (doc, term)-distinct, so bincount of codes = df
        df = np.bincount(codes, minlength=len(dictionary)) if len(dictionary) else np.empty(0, np.int64)
        parts, salted = self._assign_parts(codes, dictionary, df, doc_ids, n_docs)
        order = np.argsort(parts, kind="stable")
        parts_sorted = parts[order]
        # ONE output file per shard, sorted by partition, with parquet row
        # groups aligned to partition boundaries; the manifest records
        # part -> row-group indices so builders read exactly their bytes.
        # (One file per (shard, part) meant 96 takes + 96 parquet writes per
        # shard — write overhead dilated heavily under 16-way concurrency.)
        idx = pa.array(order)
        cols = {
            "term": pa.compute.take(term_col, idx).cast(pa.string()),
            "doc_id": pa.array(doc_ids[order], type=pa.int64()),
            "tf": pa.array(tfs[order], type=pa.int64()),
            "dl": pa.array(dls[order], type=pa.int64()),
        }
        if self.cfg.store_positions:
            pos_all = (
                pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in pos_chunks])
                if pos_chunks
                else pa.array([], type=pa.list_(pa.int32()))
            )
            cols["pos"] = pa.compute.take(pos_all, idx)
        sorted_table = pa.table(cols)
        boundaries = np.flatnonzero(np.diff(parts_sorted)) + 1
        starts = np.concatenate(([0], boundaries)) if len(parts_sorted) else np.empty(0, np.int64)
        ends = np.concatenate((boundaries, [len(parts_sorted)])) if len(parts_sorted) else np.empty(0, np.int64)
        fname = f"{safe}.pairs.parquet"
        os.makedirs(self.pairs_dir, exist_ok=True)
        tmp = os.path.join(self.pairs_dir, f".tmp-{fname}")
        part_row_groups: dict[str, list[int]] = {}
        writer = pq.ParquetWriter(
            tmp, PAIRS_SCHEMA_POS if self.cfg.store_positions else PAIRS_SCHEMA
        )
        for rg, (s, e) in enumerate(zip(starts, ends)):
            p = int(parts_sorted[s])
            writer.write_table(
                sorted_table.slice(int(s), int(e - s)), row_group_size=int(e - s)
            )
            part_row_groups.setdefault(str(p), []).append(rg)
        writer.close()
        os.replace(tmp, os.path.join(self.pairs_dir, fname))
        attrs_file = None
        if attr_cols:
            attr_dir = os.path.join(os.path.dirname(self.pairs_dir), "attributes")
            os.makedirs(attr_dir, exist_ok=True)
            attrs_file = f"{safe}.attrs.parquet"
            attr_tbl = pa.table(
                {
                    "doc_id": pa.array(
                        np.concatenate(attr_id_chunks)
                        if attr_id_chunks
                        else np.empty(0, np.int64),
                        type=pa.int64(),
                    ),
                    **{
                        c: pa.concat_arrays(
                            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in chunks]
                        )
                        if chunks
                        else pa.array([], type=pa.string())
                        for c, chunks in attr_val_chunks.items()
                    },
                }
            )
            atmp = os.path.join(attr_dir, f".tmp-{attrs_file}")
            pq.write_table(attr_tbl, atmp)
            os.replace(atmp, os.path.join(attr_dir, attrs_file))
        mf.write_manifest_file(
            man_path,
            {
                "kind": "pairs_shard",
                "shard_id": shard_id,
                "input_file": os.path.basename(file),
                "fingerprint": self.fingerprint,
                "shard_fp": shard_fp,
                "n_docs": n_docs,
                "n_tokens": n_tokens,
                "n_pairs": int(len(term_col)),
                "salted_terms": sorted(salted),
                "pairs_file": fname,
                "part_row_groups": part_row_groups,
                "attrs_file": attrs_file,
                "attributes": attr_cols,
            },
        )
        return {
            "shard_id": shard_id,
            "n_docs": n_docs,
            "n_tokens": n_tokens,
            "n_pairs": int(len(term_col)),
            "skipped": False,
        }
