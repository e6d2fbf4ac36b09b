"""DSIR-style hashed-n-gram importance weighting for data selection.

Implements the importance-weight half of DSIR (Xie et al., 2023, "Data
Selection for Language Models via Importance Resampling", NeurIPS):
token-stream features are hashed into a fixed number of buckets, a
bag-of-buckets unigram model is fit on a TARGET corpus (the
high-quality / in-domain set) and on the RAW corpus (the 100 TB pool),
and each raw document gets the log-likelihood-ratio weight

    w(doc) = sum over the doc's token stream of
             ln p_target(bucket(token)) - ln p_raw(bucket(token))

with Laplace-smoothed bucket probabilities
``p(b) = (count_b + alpha) / (total + alpha * buckets)``. High-weight
documents look like the target distribution; selection (top-k, threshold,
or Gumbel-noised sampling) is a trivial downstream filter on the weight
column.

Scale shape (the reason hashing matters): both model fits are
``map_batches`` partial ``bincount``s reduced by a ``groupby(bucket).sum``
whose output is at most ``buckets`` rows — the model that reaches the
driver and is broadcast back via ``ray.put`` is O(buckets) no matter how
large either corpus grows, unlike a vocabulary model. The scoring pass is
a single stateless ``map_batches`` over the raw corpus (one bincount +
one dot product per doc).

Determinism / oracle contract: the bucket hash is ``md5_u64(token) %
buckets`` (bit-equal to DuckDB ``md5_number_lower(term) % buckets``), the
weight is accumulated per (doc, bucket) — ``dot(bucket_counts,
log_ratio)`` — and rounded to 6 dp at the producer, so the whole operator
is value-checkable against an ANSI-SQL twin (``__ray_entry__.oracle_sql()
['dsir_weights']``).

The reference engine (FabienRoger/Distributed-Text-Search) has no data-
selection stage; this operator is part of the LLM-training-data surface
this repo adds on top of the reference's search/match capabilities.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from distributed_text_search_ray.config import AnalyzerConfig
from distributed_text_search_ray.functions.hashing import _md5_token_hashes
from distributed_text_search_ray.functions.tokenize import tokenizer_for
from distributed_text_search_ray.util import round_half_away


def _flat_buckets(texts: list[str], tk, buckets: int):
    """Tokenize a batch and bucket-hash its FLAT token stream, vectorized.

    One dictionary-encode of the stream + one md5 hash per DISTINCT token
    (not per occurrence), then a gather — the same shape as
    ``functions.tokenize.batch_pairs_dict``. Returns (bucket_per_token,
    doc_idx_per_token, tokens_per_doc) or None for a token-empty batch.
    """
    from itertools import chain

    toks = [tk.tokens(t) for t in texts]
    counts = np.fromiter((len(x) for x in toks), dtype=np.int64, count=len(toks))
    total = int(counts.sum())
    if total == 0:
        return None
    enc = pa.array(
        list(chain.from_iterable(toks)), type=pa.string()
    ).dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab_buckets = (
        _md5_token_hashes(enc.dictionary.to_pylist()) % np.uint64(buckets)
    ).astype(np.int64)
    b = vocab_buckets[codes]
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    return b, doc_idx, counts


def _bucket_counts(
    ds: ray.data.Dataset,
    buckets: int,
    analyzer: AnalyzerConfig | None,
    flag_col: str | None = None,
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Dense bucket-count vector of a (doc_id, content) dataset.

    Partial per-batch bincounts (sparse rows) -> groupby(bucket).sum ->
    at most ``buckets`` rows pulled to the driver (bounded by construction).

    With ``flag_col`` (a boolean column marking target rows), ONE pass
    fits BOTH models — returns (all_counts, flagged_counts). Tokenizing
    is the dominant cost of a fit pass, so fusing halves model-fit time
    when the target is a slice of the pool (the common DSIR setup).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        tk = tokenizer_for(analyzer)
        flat = _flat_buckets(batch.column("content").to_pylist(), tk, buckets)
        if flat is None:
            b = np.empty(0, dtype=np.int64)
            doc_idx = b
        else:
            b, doc_idx, _ = flat
        acc = np.bincount(b, minlength=buckets)
        nz = np.flatnonzero(acc)
        cols = {
            "bucket": pa.array(nz.astype(np.int64), type=pa.int64()),
            "c": pa.array(acc[nz], type=pa.int64()),
        }
        if flag_col:
            flags = np.asarray(batch.column(flag_col).to_pylist(), dtype=bool)
            bt = b[flags[doc_idx]] if len(b) else b
            acc_t = np.bincount(bt, minlength=buckets)
            cols["ct"] = pa.array(acc_t[nz], type=pa.int64())
        return pa.table(cols)

    aggs = [Sum("c", alias_name="cnt")]
    if flag_col:
        aggs.append(Sum("ct", alias_name="cnt_t"))
    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(*aggs)
        .take_all()
    )
    out = np.zeros(buckets, dtype=np.float64)
    out_t = np.zeros(buckets, dtype=np.float64) if flag_col else None
    for r in rows:
        out[r["bucket"]] = r["cnt"]
        if flag_col:
            out_t[r["bucket"]] = r["cnt_t"]
    return (out, out_t) if flag_col else out


def dsir_log_ratio(
    raw_counts: np.ndarray, target_counts: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Per-bucket ln p_target(b) - ln p_raw(b), Laplace-smoothed."""
    buckets = len(raw_counts)
    tgt_tot = float(target_counts.sum())
    raw_tot = float(raw_counts.sum())
    return np.log((target_counts + alpha) / (tgt_tot + alpha * buckets)) - np.log(
        (raw_counts + alpha) / (raw_tot + alpha * buckets)
    )


def dsir_importance_weights(
    docs: ray.data.Dataset,
    target: ray.data.Dataset | None = None,
    buckets: int = 1024,
    alpha: float = 0.5,
    analyzer: AnalyzerConfig | None = None,
    target_flag: str | None = None,
) -> ray.data.Dataset:
    """Importance weight of every raw document against a target corpus.

    ``docs`` and ``target`` are (doc_id, content) datasets; ``target`` is
    typically a filtered view of the pool (in-domain sources, a quality
    slice) or a separate small corpus. Output: (doc_id, n_tokens, weight)
    with weight rounded to 6 dp; zero-token docs are omitted (they carry
    no evidence either way, matching the SQL twin's inner join through
    the token stream).

    When the target IS a slice of the pool, pass ``target_flag`` (the
    name of a boolean column on ``docs`` marking target rows) instead of
    a separate ``target`` dataset: both bucket models then fit in ONE
    tokenize pass over the pool instead of two (identical counts, so the
    weights — and the SQL twin — are unchanged).
    """
    if (target is None) == (target_flag is None):
        raise ValueError("pass exactly one of target / target_flag")
    if target_flag is not None:
        raw_counts, target_counts = _bucket_counts(
            docs, buckets, analyzer, flag_col=target_flag
        )
    else:
        raw_counts = _bucket_counts(docs, buckets, analyzer)
        target_counts = _bucket_counts(target, buckets, analyzer)
    lr_ref = ray.put(dsir_log_ratio(raw_counts, target_counts, alpha))

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        tk = tokenizer_for(analyzer)
        texts = batch.column("content").to_pylist()
        doc_ids = batch.column("doc_id").to_numpy()
        flat = _flat_buckets(texts, tk, buckets)
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "weight": pa.array([], type=pa.float64()),
            }
        )
        if flat is None:
            return empty
        b, doc_idx, counts = flat
        # accumulate per (doc, bucket) in bucket-ascending order per doc —
        # the same addend multiset AND order as the per-doc dot(counts, lr)
        # form and the oracle's GROUP BY doc,bucket twin
        key = doc_idx * buckets + b
        uk, tf = np.unique(key, return_counts=True)
        d_of, b_of = uk // buckets, uk % buckets
        w = np.bincount(d_of, weights=tf * lr[b_of], minlength=len(texts))
        keep = counts > 0
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], type=pa.int64()),
                "n_tokens": pa.array(counts[keep], type=pa.int64()),
                "weight": pa.array(
                    round_half_away(w[keep], 6), type=pa.float64()
                ),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_select(
    weights: ray.data.Dataset,
    fraction: float = 0.25,
    total: int | None = None,
) -> ray.data.Dataset:
    """Deterministic top-fraction selection on a DSIR weight table.

    Keeps the ``ceil(fraction * N)`` highest-weight docs (ties broken by
    doc_id asc — a total order, so the selected set is unique). ``total``
    overrides the count when the caller already knows N (avoids a second
    pass). The paper's Gumbel-noise resampling variant is intentionally
    not the gated default: it is randomized, so it cannot be
    value-checked; seeded noise can be layered on top of this table by
    the caller.

    Scale note: ``sort().limit(k)`` is Ray Data's distributed top-k — the
    sort is a range-partitioned shuffle of the (small) weight table, not
    of the corpus; only k rows ever reach the driver if the caller
    ``take``s.
    """
    n = total if total is not None else weights.count()
    k = int(np.ceil(fraction * n))
    return weights.sort(["weight", "doc_id"], descending=[True, False]).limit(k)
