"""Deduplication operators for large-scale training-data pipelines.

Exact dedup, MinHash+LSH near-dup, and SimHash near-dup, each expressed
Ray-Data-first:

- exact: vectorized content-hash in ``map_batches`` then a partial+final
  ``groupby`` (hash-partition + per-group aggregate) — the only shuffle moves
  one row per (batch, hash).
- MinHash-LSH: shingle -> minhash -> band rows -> ``groupby(band)`` ->
  candidate pairs -> exact shingle-Jaccard verification. The verify step
  re-reads only candidate docs (broadcast candidate-id set, no second
  shuffle); the candidate set is assumed << corpus (true when the threshold
  is meaningful).
- SimHash: 64-bit fingerprints, banded into 4x16-bit chunks (pigeonhole: any
  pair within Hamming distance 3 shares a chunk), ``groupby(chunk)`` ->
  verified pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from distributed_text_search_ray.config import AnalyzerConfig
from distributed_text_search_ray.functions.hashing import (
    md5_hex,
    minhash_signature,
    shingle_hashes,
    simhash64,
    splitmix64,
)
from distributed_text_search_ray.functions.tokenize import Tokenizer
from distributed_text_search_ray.util import resolve_concurrency, round_half_away


def _hash_batch(batch: pa.Table) -> pa.Table:
    md5s = [md5_hex(t) for t in batch.column("content").to_pylist()]
    return pa.table(
        {
            "content_md5": pa.array(md5s, type=pa.string()),
            "doc_id": batch.column("doc_id"),
        }
    )


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Groups of byte-identical content.

    Returns (content_md5, n_copies, representative_doc_id) — representative =
    min doc_id, the deterministic "first" (SURVEY.md section 2.7).
    """
    hashed = docs.map_batches(_hash_batch, batch_format="pyarrow")
    return hashed.groupby("content_md5").aggregate(
        Count(alias_name="n_copies"),
        Min("doc_id", alias_name="representative_doc_id"),
    )


class _MinhashBands:
    """map_batches stage: doc -> (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perm: int, bands: int, shingle_n: int, analyzer: AnalyzerConfig):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n
        self.tokenizer = Tokenizer(analyzer)

    def signature(self, text: str) -> np.ndarray | None:
        toks = self.tokenizer.tokens(text)
        if not toks:
            return None
        return minhash_signature(shingle_hashes(toks, self.shingle_n), self.num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-vectorized: concatenate every doc's shingles, one signature
        # matrix for the whole batch, band hashes folded vectorized
        from distributed_text_search_ray.functions.hashing import minhash_signatures_batch

        sh_chunks, lens, kept_ids = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("content").to_pylist()
        ):
            sh = shingle_hashes(self.tokenizer.tokens(text), self.shingle_n)
            if sh.size == 0:
                continue
            sh_chunks.append(sh)
            lens.append(sh.size)
            kept_ids.append(doc_id)
        if not sh_chunks:
            return pa.table(
                {
                    "band_id": pa.array([], type=pa.int32()),
                    "band_hash": pa.array([], type=pa.int64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(np.int64)
        sigs = minhash_signatures_batch(np.concatenate(sh_chunks), starts, self.num_perm)
        n = len(kept_ids)
        # fold each band's rows into one hash: (docs, bands, r) -> (docs, bands)
        cube = sigs.reshape(n, self.bands, self.rows_per_band)
        acc = np.zeros((n, self.bands), dtype=np.uint64)
        for j in range(self.rows_per_band):
            acc = splitmix64(acc * np.uint64(0x9E3779B97F4A7C15) + cube[:, :, j])
        acc ^= splitmix64(np.arange(1, self.bands + 1, dtype=np.uint64))[None, :]
        band_hash = (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n)
        doc_rep = np.repeat(np.asarray(kept_ids, dtype=np.int64), self.bands)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_hash": pa.array(band_hash.reshape(-1), type=pa.int64()),
                "doc_id": pa.array(doc_rep, type=pa.int64()),
            }
        )


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    threshold: float = 0.5,
    num_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    analyzer: AnalyzerConfig | None = None,
    concurrency=None,
) -> ray.data.Dataset:
    """Near-duplicate pairs with exact shingle-set Jaccard >= threshold.

    LSH proposes candidates (recall ~1 - (1 - t^r)^b; for t=0.5, r=4, b=32
    the miss probability is ~0.13 per pair at the threshold and vanishes
    above it); exact Jaccard verification removes false positives, so output
    precision is exact.
    """
    analyzer = analyzer or AnalyzerConfig()
    bander = {"num_perm": num_perm, "bands": bands, "shingle_n": shingle_n, "analyzer": analyzer}
    band_rows = docs.map_batches(
        _MinhashBands,
        fn_constructor_kwargs=bander,
        batch_format="pyarrow",
        concurrency=resolve_concurrency(concurrency),
    )
    # candidate detection, size-aware (same pattern as the dictionary merge):
    # band rows are 32/doc — under ~5M rows bucket on the driver with one
    # vectorized pass; above, a distributed aggregate finds the >=2-member
    # bucket keys first and only those rows come back
    def key_col(batch: pa.Table) -> pa.Table:
        key = (
            batch.column("band_hash").to_numpy() * np.int64(64)
            + batch.column("band_id").to_numpy()
        )
        return pa.table({"key": pa.array(key, type=pa.int64()), "doc_id": batch.column("doc_id")})

    keyed = band_rows.map_batches(key_col, batch_format="pyarrow").materialize()
    if keyed.count() <= 5_000_000:
        t = pa.concat_tables(ray.get(keyed.to_arrow_refs()))
        keys = t.column("key").to_numpy()
        docs_col = t.column("doc_id").to_numpy()
        order = np.argsort(keys, kind="stable")
        ks, ds_ = keys[order], docs_col[order]
        is_start = np.empty(len(ks), dtype=bool)
        is_start[0] = True
        np.not_equal(ks[1:], ks[:-1], out=is_start[1:])
        starts = np.flatnonzero(is_start)
        ends = np.concatenate((starts[1:], [len(ks)]))
        pair_set = set()
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ids = sorted(set(ds_[s:e].tolist()))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    pair_set.add((ids[i], ids[j]))
        cand_pairs = sorted(pair_set)
    else:
        counts = keyed.groupby("key").aggregate(Count(alias_name="n"))
        hot_keys = {r["key"] for r in counts.filter(expr="n >= 2").take_all()}
        if not hot_keys:
            cand_pairs = []
        else:

            def keep_hot(batch: pa.Table) -> pa.Table:
                keep = [k in hot_keys for k in batch.column("key").to_pylist()]
                return batch.filter(pa.array(keep))

            rows = keyed.map_batches(keep_hot, batch_format="pyarrow").take_all()
            buckets: dict[int, set[int]] = {}
            for r in rows:
                buckets.setdefault(r["key"], set()).add(r["doc_id"])
            pair_set = set()
            for ids_set in buckets.values():
                ids = sorted(ids_set)
                for i in range(len(ids)):
                    for j in range(i + 1, len(ids)):
                        pair_set.add((ids[i], ids[j]))
            cand_pairs = sorted(pair_set)
    if not cand_pairs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "jaccard": pa.array([], type=pa.float64()),
                }
            )
        )
    cand_ids = sorted({d for p in cand_pairs for d in p})
    id_set = set(cand_ids)

    def shingles_of_candidates(batch: pa.Table) -> pa.Table:
        tk = Tokenizer(analyzer)
        out_id, out_sh = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("content").to_pylist()
        ):
            if doc_id in id_set:
                out_id.append(doc_id)
                out_sh.append(shingle_hashes(tk.tokens(text), shingle_n).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "shingles": pa.array(out_sh, type=pa.list_(pa.uint64())),
            }
        )

    sh_rows = docs.map_batches(shingles_of_candidates, batch_format="pyarrow").take_all()
    sh = {r["doc_id"]: set(np.asarray(r["shingles"]).tolist()) for r in sh_rows}
    a_out, b_out, j_out = [], [], []
    for a, b in sorted(cand_pairs):
        sa, sb = sh.get(a, set()), sh.get(b, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            a_out.append(a)
            b_out.append(b)
            j_out.append(round_half_away(j, 6))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(a_out, type=pa.int64()),
                "doc_b": pa.array(b_out, type=pa.int64()),
                "jaccard": pa.array(j_out, type=pa.float64()),
            }
        )
    )


def _simhash_batch(analyzer: AnalyzerConfig):
    tk = Tokenizer(analyzer)

    def f(batch: pa.Table) -> pa.Table:
        hashes = [
            np.int64(np.uint64(simhash64(tk.tokens(t))).astype(np.int64))
            for t in batch.column("content").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(hashes, type=pa.int64()),
            }
        )

    return f


def simhash_fingerprints(
    docs: ray.data.Dataset, analyzer: AnalyzerConfig | None = None
) -> ray.data.Dataset:
    """(doc_id, simhash) 64-bit fingerprints (stored as int64 bit-pattern)."""
    return docs.map_batches(_simhash_batch(analyzer or AnalyzerConfig()), batch_format="pyarrow")


def simhash_near_dup_pairs(
    docs: ray.data.Dataset,
    max_hamming: int = 3,
    analyzer: AnalyzerConfig | None = None,
) -> ray.data.Dataset:
    """Pairs with simhash Hamming distance <= max_hamming (<= 3 for exact
    recall with 4 x 16-bit banding; larger values lower recall)."""
    fp = simhash_fingerprints(docs, analyzer)

    def band_rows(batch: pa.Table) -> pa.Table:
        h = batch.column("simhash").to_numpy().astype(np.uint64)
        ids = batch.column("doc_id").to_numpy()
        bands, chunks, out_ids, sims = [], [], [], []
        for b in range(4):
            chunk = ((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.extend([b] * len(ids))
            chunks.extend(chunk.tolist())
            out_ids.extend(ids.tolist())
            sims.extend(h.astype(np.int64).tolist())
        return pa.table(
            {
                "band_id": pa.array(bands, type=pa.int32()),
                "chunk": pa.array(chunks, type=pa.int64()),
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "simhash": pa.array(sims, type=pa.int64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            set(zip(group.column("doc_id").to_pylist(), group.column("simhash").to_pylist()))
        )
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin((rows[i][1] ^ rows[j][1]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pa.table(
            {
                "doc_a": pa.array(a, type=pa.int64()),
                "doc_b": pa.array(b, type=pa.int64()),
                "hamming": pa.array(d, type=pa.int64()),
            }
        )

    pairs = (
        fp.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_id", "chunk"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming_min"))
