"""Round-4 additions: DSIR importance weighting and tombstone-delete search.

DSIR tests verify the distributed operator against an independent pure-
Python brute force (same math, no Ray, no shared code path beyond the
tokenizer and md5_u64 primitives that are themselves differential-tested
elsewhere). The delete test pins the stale-stats tombstone contract: a
survivor's score is bit-identical to its full-index score, deleted docs
vanish from every result.
"""

import math

import numpy as np
import pytest
import ray.data

from distributed_text_search_ray.functions.hashing import md5_u64
from distributed_text_search_ray.functions.tokenize import tokenizer_for
from distributed_text_search_ray.pipelines.dsir import (
    dsir_importance_weights,
    dsir_select,
)
from distributed_text_search_ray.util import round_half_away

from tests.conftest import corpus_docs


def _brute_dsir(raw_docs, target_docs, buckets=256, alpha=0.5):
    tk = tokenizer_for(None)

    def counts(docs):
        c = [0] * buckets
        for _, text in docs:
            for t in tk.tokens(text):
                c[md5_u64(t) % buckets] += 1
        return c

    rc, tc = counts(raw_docs), counts(target_docs)
    R, T = float(sum(rc)), float(sum(tc))
    lr = [
        math.log((tc[b] + alpha) / (T + alpha * buckets))
        - math.log((rc[b] + alpha) / (R + alpha * buckets))
        for b in range(buckets)
    ]
    out = {}
    for doc_id, text in raw_docs:
        toks = tk.tokens(text)
        if not toks:
            continue
        per_bucket = {}
        for t in toks:
            b = md5_u64(t) % buckets
            per_bucket[b] = per_bucket.get(b, 0) + 1
        w = float(np.dot(
            np.array([per_bucket[b] for b in sorted(per_bucket)], dtype=np.float64),
            np.array([lr[b] for b in sorted(per_bucket)], dtype=np.float64),
        ))
        out[doc_id] = (len(toks), round_half_away(w, 6))
    return out


def test_dsir_weights_match_bruteforce(code_corpus):
    corpus_dir, _ = code_corpus
    docs = corpus_docs(corpus_dir)
    # target = every 5th doc (an arbitrary deterministic "in-domain" slice)
    target = [d for d in docs if d[0] % 5 == 0]
    expected = _brute_dsir(docs, target, buckets=256)

    import pyarrow as pa

    def ds_of(pairs):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "content": pa.array([p[1] for p in pairs], type=pa.string()),
                }
            )
        ).repartition(4)

    got = dsir_importance_weights(ds_of(docs), ds_of(target), buckets=256).take_all()
    got_map = {r["doc_id"]: (r["n_tokens"], r["weight"]) for r in got}
    assert got_map == expected
    # target docs should look like the target distribution: their mean
    # weight must exceed the non-target mean (sanity of the sign convention)
    t_ids = {d[0] for d in target}
    tw = [w for d, (_, w) in got_map.items() if d in t_ids]
    rw = [w for d, (_, w) in got_map.items() if d not in t_ids]
    assert np.mean(tw) > np.mean(rw)


def test_dsir_fused_flag_path_equals_two_pass(code_corpus):
    """target_flag (single fused model-fit pass) must produce identical
    weights to the two-dataset path — same counts, same model, bit-equal."""
    corpus_dir, _ = code_corpus
    docs = corpus_docs(corpus_dir)

    import pyarrow as pa

    def ds_of(pairs, flag=False):
        cols = {
            "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
            "content": pa.array([p[1] for p in pairs], type=pa.string()),
        }
        if flag:
            cols["is_target"] = pa.array([p[0] % 5 == 0 for p in pairs])
        return ray.data.from_arrow(pa.table(cols)).repartition(4)

    target = [d for d in docs if d[0] % 5 == 0]
    two_pass = dsir_importance_weights(
        ds_of(docs), ds_of(target), buckets=256
    ).take_all()
    fused = dsir_importance_weights(
        ds_of(docs, flag=True), buckets=256, target_flag="is_target"
    ).take_all()
    key = lambda r: r["doc_id"]
    assert sorted(fused, key=key) == sorted(two_pass, key=key)
    with pytest.raises(ValueError):
        dsir_importance_weights(ds_of(docs))  # neither target nor flag


def test_dsir_select_deterministic_topfraction(code_corpus):
    corpus_dir, _ = code_corpus
    docs = corpus_docs(corpus_dir)
    target = [d for d in docs if d[0] % 5 == 0]

    import pyarrow as pa

    def ds_of(pairs):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "content": pa.array([p[1] for p in pairs], type=pa.string()),
                }
            )
        ).repartition(4)

    weights = dsir_importance_weights(ds_of(docs), ds_of(target), buckets=256)
    rows = weights.take_all()
    sel = dsir_select(
        ray.data.from_items(rows).repartition(4), fraction=0.25
    ).take_all()
    k = math.ceil(0.25 * len(rows))
    assert len(sel) == k
    want = sorted(rows, key=lambda r: (-r["weight"], r["doc_id"]))[:k]
    assert [r["doc_id"] for r in sel] == [r["doc_id"] for r in want]


def test_deleted_clone_search_stale_stats_contract(code_corpus, tmp_path):
    """Hardlink-clone + tombstone: survivors keep their exact full-index
    scores (stats are build-time), deleted docs vanish from the top-k."""
    import os
    import shutil

    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.build import build_index, delete_docs
    from distributed_text_search_ray.pipelines.search import search_topk

    corpus_dir, _ = code_corpus
    full_idx = str(tmp_path / "full")
    build_index(corpus_dir, full_idx, IndexConfig(num_partitions=4))
    clone = str(tmp_path / "clone")
    shutil.copytree(full_idx, clone, copy_function=os.link)

    docs = corpus_docs(corpus_dir)
    deleted = {d for d, _ in docs if d % 3 == 0}
    delete_docs(clone, sorted(deleted))

    queries = [(0, "def tokenize value"), (1, "import index"), (2, "self data")]
    n = len(docs)
    full = search_topk(full_idx, queries, topk=n).take_all()
    after = search_topk(clone, queries, topk=n).take_all()

    want = {}
    for r in full:
        if r["doc_id"] not in deleted:
            want.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    got = {}
    for r in after:
        assert r["doc_id"] not in deleted
        got.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid in want:
        assert sorted(got[qid]) == sorted(want[qid])
    # the original index is untouched by the clone's tombstone
    assert not os.path.exists(os.path.join(full_idx, "deleted.parquet"))
