"""Tests for the training-data pipeline extras: dedup, ANN, text stats,
relational aggregates. Oracles are in-test brute-force (numpy / DuckDB)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from distributed_text_search_ray.functions.hashing import md5_hex
from distributed_text_search_ray.pipelines.ann import ann_brute_topk, ann_lsh_topk
from distributed_text_search_ray.pipelines.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash_near_dup_pairs,
)
from distributed_text_search_ray.pipelines.relational import events_window_agg, tpch_q1
from distributed_text_search_ray.pipelines.textstats import (
    language_id,
    quality_scores,
    token_counts,
)

SF = "/root/testdata/sf0.001"


def docs_ds():
    t = pq.read_table(f"{SF}/documents.parquet")
    return ray.data.from_arrow(
        pa.table({"doc_id": t.column("doc_id"), "content": t.column("text")})
    )


def test_exact_dedup_with_planted_dupes():
    t = pq.read_table(f"{SF}/documents.parquet")
    base = pa.table({"doc_id": t.column("doc_id"), "content": t.column("text")})
    dupe = pa.table(
        {
            "doc_id": pa.array([10_000, 10_001], type=pa.int64()),
            "content": pa.array([t.column("text")[0].as_py()] * 2, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([base, dupe]))
    out = exact_dedup(ds).take_all()
    target = md5_hex(t.column("text")[0].as_py())
    row = next(r for r in out if r["content_md5"] == target)
    assert row["n_copies"] == 3
    assert row["representative_doc_id"] == t.column("doc_id")[0].as_py()
    assert sum(r["n_copies"] for r in out) == 502


def test_empty_corpus_pipelines_return_empty():
    """Zero-row inputs flow through every dedup/stats/apm pipeline without
    schema-loss crashes; apm still reports one zero-count row per pattern."""
    from distributed_text_search_ray.pipelines import apm, dedup, textstats

    empty = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "content": pa.array([], type=pa.string()),
            }
        )
    )
    assert exact_dedup(empty).take_all() == []
    assert dedup.dedup_filter(empty).take_all() == []
    assert minhash_lsh_pairs(empty).take_all() == []
    assert simhash_near_dup_pairs(empty).take_all() == []
    assert dedup.ngram_jaccard_pairs(empty).take_all() == []
    assert textstats.token_counts(empty).take_all() == []
    for concat in (False, True):
        rows = apm.windowed_match_counts(empty, [(0, "ab", 1)], concat=concat).take_all()
        assert [(r["query_id"], r["n_matches"]) for r in rows] == [(0, 0)]


def test_dedup_filter_keeps_min_doc_id():
    from distributed_text_search_ray.pipelines.dedup import dedup_filter

    t = pq.read_table(f"{SF}/documents.parquet")
    base = pa.table({"doc_id": t.column("doc_id"), "content": t.column("text")})
    dupe = pa.table(
        {
            "doc_id": pa.array([10_000, 10_001], type=pa.int64()),
            "content": pa.array([t.column("text")[0].as_py()] * 2, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([base, dupe]))
    out = dedup_filter(ds).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert len(ids) == 500  # the two planted copies collapse into doc 0's row
    assert 10_000 not in ids and 10_001 not in ids
    assert t.column("doc_id")[0].as_py() in ids
    by_id = {r["doc_id"]: r["content"] for r in out}
    assert by_id[t.column("doc_id")[0].as_py()] == t.column("text")[0].as_py()


def test_minhash_finds_planted_near_dupes():
    t = pq.read_table(f"{SF}/documents.parquet")
    text0 = t.column("text")[0].as_py()
    words = text0.split()
    words[3] = "mutated"
    near = " ".join(words)
    base = pa.table({"doc_id": t.column("doc_id"), "content": t.column("text")})
    extra = pa.table(
        {
            "doc_id": pa.array([20_000], type=pa.int64()),
            "content": pa.array([near], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([base, extra]))
    pairs = minhash_lsh_pairs(ds, threshold=0.5).take_all()
    doc0 = t.column("doc_id")[0].as_py()
    assert any(
        {p["doc_a"], p["doc_b"]} == {doc0, 20_000} and p["jaccard"] >= 0.5 for p in pairs
    )


def test_minhash_distributed_at_scale():
    """2550 planted near-dup pairs (~100x the sf0.01 candidate count): the
    distributed mining + verify path must find exactly the within-group
    pairs, with exact shingle-Jaccard values (in-test numpy oracle)."""
    from distributed_text_search_ray.config import AnalyzerConfig
    from distributed_text_search_ray.functions.hashing import shingle_hashes
    from distributed_text_search_ray.functions.tokenize import Tokenizer

    rng = np.random.default_rng(7)
    groups, per_group, n_words = 850, 3, 40
    ids, texts = [], []
    for g in range(groups):
        base = [f"g{g}w{k}" for k in range(n_words)]
        for v in range(per_group):
            # one mutated word -> pair jaccard ~0.73, where LSH miss
            # probability is ~3e-5 (at j~=0.5 it is ~0.13 — the documented
            # recall caveat, deliberately avoided here)
            words = list(base)
            pos = int(rng.integers(0, n_words))
            words[pos] = f"g{g}v{v}m{pos}"
            ids.append(g * 10 + v)
            texts.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(ds, threshold=0.5, pair_partitions=16).take_all()
    }
    tk = Tokenizer(AnalyzerConfig())
    sh = {i: set(shingle_hashes(tk.tokens(t), 3).tolist()) for i, t in zip(ids, texts)}
    want = {}
    for g in range(groups):
        gids = [g * 10 + v for v in range(per_group)]
        for i in range(per_group):
            for j in range(i + 1, per_group):
                a, b = gids[i], gids[j]
                jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if jac >= 0.5:
                    want[(a, b)] = round(jac, 6)
    assert len(want) >= 2500  # the construction keeps jaccard well above 0.5
    assert got == want  # exact pair set AND exact jaccard values


def test_ngram_jaccard_exact_recall_near_threshold():
    """Pairs sitting close to the threshold — exactly where LSH recall
    degrades — must ALL be found with exact jaccard values (recall-exact
    path). In-test numpy oracle over every in-group pair; cross-group pairs
    share no shingles, so the oracle set is complete."""
    from distributed_text_search_ray.config import AnalyzerConfig
    from distributed_text_search_ray.functions.hashing import shingle_hashes
    from distributed_text_search_ray.functions.tokenize import Tokenizer
    from distributed_text_search_ray.pipelines.dedup import ngram_jaccard_pairs

    rng = np.random.default_rng(11)
    groups, per_group, n_words = 60, 3, 30
    ids, texts = [], []
    for g in range(groups):
        base = [f"g{g}w{k}" for k in range(n_words)]
        for v in range(per_group):
            words = list(base)
            # 2-4 mutated words; each kills up to 3 trigram shingles in each
            # doc of a pair, so pairwise jaccard lands around 0.2-0.45,
            # straddling the 0.3 threshold from both sides
            n_mut = int(rng.integers(2, 5))
            for pos in rng.choice(n_words, size=n_mut, replace=False):
                words[int(pos)] = f"g{g}v{v}m{int(pos)}"
            ids.append(g * 10 + v)
            texts.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(ds, threshold=0.3, pair_partitions=16).take_all()
    }
    tk = Tokenizer(AnalyzerConfig())
    sh = {i: set(shingle_hashes(tk.tokens(t), 3).tolist()) for i, t in zip(ids, texts)}
    want = {}
    for g in range(groups):
        gids = [g * 10 + v for v in range(per_group)]
        for i in range(per_group):
            for j in range(i + 1, per_group):
                a, b = gids[i], gids[j]
                jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if jac >= 0.3:
                    want[(a, b)] = round(jac, 6)
    # the construction actually produces near-threshold pairs on both sides
    assert 0 < len(want) < groups * 3
    assert got == want


def test_ngram_jaccard_bucket_cap_drops_boilerplate():
    """A shingle shared by more docs than max_bucket_size is dropped from
    candidate generation (logged recall cut); pairs whose only overlap is
    that boilerplate shingle disappear, distinct-content pairs survive."""
    from distributed_text_search_ray.pipelines.dedup import ngram_jaccard_pairs

    boiler = "license apache version two"  # one shared 3-shingle region
    texts = [f"doc{i} unique{i} tokens{i} {boiler}" for i in range(10)]
    texts += ["alpha beta gamma delta epsilon", "alpha beta gamma delta zeta"]
    ids = list(range(12))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    )
    uncapped = ngram_jaccard_pairs(ds, threshold=0.05, pair_partitions=4).take_all()
    assert any({p["doc_a"], p["doc_b"]} == {10, 11} for p in uncapped)
    assert any(p["doc_a"] < 10 and p["doc_b"] < 10 for p in uncapped)
    capped = ngram_jaccard_pairs(
        ds, threshold=0.05, pair_partitions=4, max_bucket_size=4
    ).take_all()
    assert any({p["doc_a"], p["doc_b"]} == {10, 11} for p in capped)
    assert not any(p["doc_a"] < 10 and p["doc_b"] < 10 for p in capped)


def test_near_dedup_filter_keeps_one_per_cluster():
    from distributed_text_search_ray.pipelines.dedup import near_dedup_filter

    rng = np.random.default_rng(3)
    groups, per_group, n_words = 40, 4, 40
    ids, texts = [], []
    for g in range(groups):
        base = [f"g{g}w{k}" for k in range(n_words)]
        for v in range(per_group):
            words = list(base)
            if v:  # v=0 is the pristine representative; jaccard(v0, vi) ~0.85
                pos = int(rng.integers(0, n_words))
                words[pos] = f"g{g}v{v}m"
            ids.append(g * 10 + v)
            texts.append(" ".join(words))
    # plus dissimilar singletons that must all survive
    for s in range(10):
        ids.append(10_000 + s)
        texts.append(" ".join(f"solo{s}w{k}" for k in range(n_words)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    )
    # bands=32 (r=4) suits the 0.5 threshold — same guidance as
    # minhash_lsh_pairs' default banding
    kept = sorted(
        r["doc_id"]
        for r in near_dedup_filter(
            ds, threshold=0.5, bands=32, pair_partitions=16
        ).take_all()
    )
    want = sorted([g * 10 for g in range(groups)] + [10_000 + s for s in range(10)])
    assert kept == want


def test_hopping_window_contains_tumbling_at_aligned_starts():
    """Hour-aligned hopping windows (width 60m, hop 15m) cover exactly the
    same [s, s+1h) event sets as the tumbling 1h windows."""
    from distributed_text_search_ray.pipelines.relational import (
        events_hopping_window,
        events_window_agg,
    )

    hop = {
        (r["event_type"], r["window_start"]): (r["n_events"], r["sum_value"])
        for r in events_hopping_window(SF, 60, 15).take_all()
        if r["window_start"] % 3600 == 0
    }
    tumb = {}
    for r in events_window_agg(SF, 60).take_all():
        ws = r["window_start"]
        epoch = int(ws.timestamp()) if hasattr(ws, "timestamp") else int(ws)
        tumb[(r["event_type"], epoch)] = (r["n_events"], r["sum_value"])
    assert hop == tumb and len(hop) > 100


def test_kmv_sketch_accuracy_and_order_independence():
    import re

    from distributed_text_search_ray.pipelines.textstats import distinct_term_estimate

    t = pq.read_table(f"{SF}/documents.parquet")
    exact = len(
        {w for tx in t.column("text").to_pylist() for w in re.findall(r"[a-z0-9_]+", tx.lower())}
    )
    row = distinct_term_estimate(docs_ds(), k=256).take_all()[0]
    assert abs(row["estimate"] - exact) / exact < 3 / (256 ** 0.5)  # ~3 sigma
    # order independence: different block structure, identical sketch row
    row2 = distinct_term_estimate(docs_ds().repartition(7), k=256).take_all()[0]
    assert row == row2
    # fewer than k distinct terms -> the sketch degrades to the exact count
    small = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "content": pa.array(["alpha beta gamma alpha"], type=pa.string()),
            }
        )
    )
    r = distinct_term_estimate(small, k=256).take_all()[0]
    assert r["estimate"] == 3.0 and r["kth_min_hash"] == -1


def test_contamination_check_finds_planted_leak():
    from distributed_text_search_ray.pipelines.dedup import contamination_check

    bench = [(0, "what is the airspeed velocity of an unladen swallow")]
    texts = [
        "completely unrelated document about parquet files and compression",
        "prefix text then what is the airspeed velocity of an unladen swallow embedded",
        "shares only airspeed velocity tokens but no trigram runs at velocity all",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    )
    rows = contamination_check(ds, bench, min_overlap=2).take_all()
    assert [(r["doc_id"], r["bench_id"]) for r in rows] == [(2, 0)]
    assert rows[0]["n_shared"] == 7  # all 7 bench trigrams embedded verbatim


def test_deterministic_sample_stable_and_unbiased():
    from distributed_text_search_ray.functions.hashing import md5_u64
    from distributed_text_search_ray.pipelines.textstats import deterministic_sample

    ds = docs_ds()
    a = sorted(r["doc_id"] for r in deterministic_sample(ds, 20, salt="x").take_all())
    b = sorted(r["doc_id"] for r in deterministic_sample(ds, 20, salt="x").take_all())
    assert a == b  # rerun-stable (the resumability property)
    want = sorted(
        r["doc_id"]
        for r in ds.take_all()
        if md5_u64(f"{r['doc_id']}x") % 100 < 20
    )
    assert a == want
    assert 0 < len(a) < 500  # neither empty nor everything
    # different salt -> different (deterministic) subset
    c = sorted(r["doc_id"] for r in deterministic_sample(ds, 20, salt="y").take_all())
    assert c != a


def test_bigram_counts_match_python():
    import re
    from collections import Counter

    from distributed_text_search_ray.pipelines.textstats import bigram_counts

    t = pq.read_table(f"{SF}/documents.parquet")
    cnt: Counter = Counter()
    for tx in t.column("text").to_pylist():
        toks = re.findall(r"[a-z0-9_]+", tx.lower())
        cnt.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r["bigram"], r["n"]) for r in bigram_counts(docs_ds(), top_n=10).take_all()
    ]
    assert got == want


def test_simhash_pairs_on_near_dupes():
    # near-dup = one mutated word in a real doc (hamming ~4); far doc ~40
    t0 = pq.read_table(f"{SF}/documents.parquet").column("text")[1].as_py()
    words = t0.split()
    words[5] = "mutated"
    texts = [t0, " ".join(words), "completely different words entirely unrelated " * 10]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    )
    # n_bands defaults to 8 for max_hamming=6 -> pigeonhole-EXACT recall
    pairs = simhash_near_dup_pairs(ds, max_hamming=6).take_all()
    assert any({p["doc_a"], p["doc_b"]} == {1, 2} for p in pairs)
    assert not any(3 in {p["doc_a"], p["doc_b"]} for p in pairs)
    # explicit band count keeps the old 4x16 behavior available
    pairs4 = simhash_near_dup_pairs(ds, max_hamming=3, n_bands=4).take_all()
    assert all(p["hamming_min"] <= 3 for p in pairs4)


def _emb_table():
    return pq.read_table(f"{SF}/embeddings.parquet")


def test_ann_brute_matches_numpy():
    t = _emb_table()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = t.column("vec_id").to_numpy()
    queries = [(int(ids[i]), X[i].tolist()) for i in range(3)]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = ann_brute_topk(ds, queries, k=5).take_all()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for qid, qv in queries:
        qn = np.array(qv) / np.linalg.norm(qv)
        sims = np.round(Xn @ qn, 6)
        mask = ids != qid
        order = np.lexsort((ids[mask], -sims[mask]))[:5]
        want = list(zip(ids[mask][order].tolist(), sims[mask][order].tolist()))
        mine = [
            (r["vec_id"], r["cosine"])
            for r in sorted((x for x in got if x["query_vec_id"] == qid), key=lambda r: r["rank"])
        ]
        assert mine == want


def test_ann_lsh_recall_reasonable():
    t = _emb_table()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = t.column("vec_id").to_numpy()
    queries = [(int(ids[i]), X[i].tolist()) for i in range(5)]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    brute = ann_brute_topk(ds, queries, k=10).take_all()
    lsh = ann_lsh_topk(ds, queries, k=10, n_bits=6).take_all()
    hits = total = 0
    for qid, _ in queries:
        b = {r["vec_id"] for r in brute if r["query_vec_id"] == qid}
        l = {r["vec_id"] for r in lsh if r["query_vec_id"] == qid}
        hits += len(b & l)
        total += len(b)
    assert hits / total > 0.3  # multi-probe 1-bit LSH, 64-dim: modest recall


def test_textstats_match_duckdb():
    ds = docs_ds()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got_tc = {r["doc_id"]: r["n_tokens"] for r in token_counts(ds).take_all()}
    want_tc = dict(
        con.execute(
            "SELECT doc_id, len(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> ''))"
            " FROM documents"
        ).fetchall()
    )
    assert got_tc == want_tc

    got_q = {r["doc_id"]: (r["stopword_ratio"], r["quality"]) for r in quality_scores(ds).take_all()}
    want_q = dict(
        con.execute(
            """
            WITH tok AS (
              SELECT doc_id, t.term FROM documents,
              unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'), x -> x <> '')) AS t(term)
            ), agg AS (
              SELECT doc_id, count(*) n,
                     sum(CASE WHEN term IN ('a','and','in','is','it','of','the','to') THEN 1 ELSE 0 END) sw
              FROM tok GROUP BY 1)
            SELECT doc_id, (round(sw/n::DOUBLE, 6), round(sw/n::DOUBLE*0.5 + least(n,200)/400.0, 6))
            FROM agg
            """
        ).fetchall()
    )
    for d, (swr, q) in want_q.items():
        assert got_q[d][0] == pytest.approx(swr, abs=1e-9)
        assert got_q[d][1] == pytest.approx(q, abs=1e-9)

    preds = {r["doc_id"]: r["pred_lang"] for r in language_id(ds).take_all()}
    assert set(preds.values()) <= {"en", "es", "de", "fr", "und"}


def test_tpch_q1_matches_duckdb():
    got = tpch_q1("/root/testdata/sf0.001").take_all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = con.execute(
        """
        SELECT l_returnflag, l_linestatus, round(sum(l_quantity),4) sum_qty,
               round(sum(l_extendedprice),4) sum_base_price,
               round(sum(l_extendedprice*(1-l_discount)),4) sum_disc_price,
               round(avg(l_quantity),4) avg_qty, count(*) count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1,2 ORDER BY 1,2
        """
    ).fetchall()
    got_rows = sorted(
        (
            r["l_returnflag"],
            r["l_linestatus"],
            r["sum_qty"],
            r["sum_base_price"],
            r["sum_disc_price"],
            r["avg_qty"],
            r["count_order"],
        )
        for r in got
    )
    assert got_rows == [tuple(w) for w in want]


def test_events_window_matches_duckdb():
    got = events_window_agg(SF, window_minutes=60).take_all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.execute(
        """
        SELECT event_type, to_timestamp((epoch_us(ts) // 3600000000) * 3600)::TIMESTAMP window_start,
               count(*) n_events, round(sum(value),4) sum_value
        FROM events GROUP BY 1,2 ORDER BY 1,2
        """
    ).fetchall()
    got_rows = sorted(
        (r["event_type"], r["window_start"], r["n_events"], r["sum_value"]) for r in got
    )
    assert got_rows == [tuple(w) for w in want]


def test_ann_ivf_fit_sample_unbiased_on_ordered_corpus():
    """The quantizer fits on a seeded uniform sample. On a corpus ORDERED by
    cluster (first-N rows all one cluster — pathological for a limit()-based
    sample), queries from the later clusters must still be answered with
    good recall."""
    from distributed_text_search_ray.pipelines.ann import ann_brute_topk, ann_ivf_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 16)) * 6
    rows = []
    for ci in range(4):  # cluster 0 occupies the first 600 rows
        for _ in range(600):
            rows.append(centers[ci] + rng.standard_normal(16))
    X = np.array(rows)
    ids = np.arange(len(X), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(X.tolist(), type=pa.list_(pa.float64())),
            }
        )
    )
    # queries live in the LAST cluster — invisible to a first-500 sample
    queries = [(int(ids[-1 - i]), X[-1 - i].tolist()) for i in range(3)]
    brute = ann_brute_topk(ds, queries, k=10).take_all()
    ivf = ann_ivf_topk(
        ds, queries, k=10, n_centroids=4, nprobe=1, fit_sample=500
    ).take_all()
    hits = total = 0
    for qid, _ in queries:
        b = {r["vec_id"] for r in brute if r["query_vec_id"] == qid}
        l = {r["vec_id"] for r in ivf if r["query_vec_id"] == qid}
        hits += len(b & l)
        total += len(b)
    assert hits / total >= 0.8  # well-separated clusters: probing the right cell


def test_ann_ivf_recall_reasonable():
    from distributed_text_search_ray.pipelines.ann import ann_ivf_topk

    t = _emb_table()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = t.column("vec_id").to_numpy()
    queries = [(int(ids[i]), X[i].tolist()) for i in range(5)]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    brute = ann_brute_topk(ds, queries, k=10).take_all()
    ivf = ann_ivf_topk(ds, queries, k=10, n_centroids=8, nprobe=3).take_all()
    hits = total = 0
    for qid, _ in queries:
        b = {r["vec_id"] for r in brute if r["query_vec_id"] == qid}
        l = {r["vec_id"] for r in ivf if r["query_vec_id"] == qid}
        hits += len(b & l)
        total += len(b)
    assert hits / total > 0.5  # probing 3/8 cells

    # determinism: same seed -> same result
    ivf2 = ann_ivf_topk(ds, queries, k=10, n_centroids=8, nprobe=3).take_all()
    key = lambda rows: sorted((r["query_vec_id"], r["rank"], r["vec_id"]) for r in rows)
    assert key(ivf) == key(ivf2)


def test_cheap_queries_match_duckdb_oracles():
    """Pytest-level net over the driver contract for entries without a
    dedicated differential test: run the queries() callable and its
    oracle_sql() side by side at sf0.001 (index-free entries only — the
    BM25/fuzzy family has its own differential suites)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for tbl in ("documents", "events", "embeddings"):
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF}/{tbl}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    for name in (
        "range_join_1h",
        "length_quantiles",
        "simhash_fp",
        "exact_dedup",
        "repetition_scores",
        "redact_props",
    ):
        got = qs[name](SF).to_pandas()
        cols = sorted(got.columns)
        mine = sorted(map(tuple, got[cols].itertuples(index=False)))
        w = con.sql(oracles[name]).df()
        want = sorted(map(tuple, w[sorted(w.columns)].itertuples(index=False)))
        assert mine == want, name


def test_repetition_scores_flag_planted_boilerplate():
    """A doc that is one phrase repeated scores ~1 on both fractions; the
    organic corpus docs stay low. Values are pinned by the SQL oracle in
    test_cheap_queries_match_duckdb_oracles; this checks the signal."""
    from distributed_text_search_ray.pipelines.textstats import repetition_scores

    spam = " ".join(["click here now"] * 40)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "content": pa.array([spam, "the quick brown fox jumps over dogs"]),
            }
        )
    )
    rows = {r["doc_id"]: r for r in repetition_scores(ds).take_all()}
    assert rows[1]["dup_trigram_frac"] > 0.9
    assert rows[1]["top_bigram_frac"] > 0.3
    assert rows[2]["dup_trigram_frac"] == 0.0
    # short docs degrade to 0, not NaN
    tiny = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([3], type=pa.int64()), "content": pa.array(["hi"])})
    )
    r3 = repetition_scores(tiny).take_all()[0]
    assert (r3["dup_trigram_frac"], r3["top_bigram_frac"]) == (0.0, 0.0)


def test_redact_text_rules_ordered():
    from distributed_text_search_ray.pipelines.textstats import redact_text

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "content": pa.array(
                    ["mail bob99@example.com at 12.5 or 7", "no secrets here"]
                ),
            }
        )
    )
    rows = {r["doc_id"]: r for r in redact_text(ds).take_all()}
    # EMAIL rule fires before NUM ever sees the address's digits
    assert rows[1]["redacted"] == "mail <EMAIL> at <NUM> or <NUM>"
    assert rows[1]["n_redactions"] == 3
    assert rows[2] == {"doc_id": 2, "redacted": "no secrets here", "n_redactions": 0}


def test_pack_sequences_matches_pure_python_and_is_layout_independent():
    from distributed_text_search_ray.functions.tokenize import tokenizer_for
    from distributed_text_search_ray.pipelines.pack import pack_greedy, pack_sequences

    max_tokens, range_size = 64, 50
    ds = docs_ds()
    got = pack_sequences(ds, max_tokens=max_tokens, range_size=range_size).take_all()
    got_by_id = {r["doc_id"]: r for r in got}

    # pure-python oracle: same greedy fill per doc_id range
    tk = tokenizer_for(None)
    t = pq.read_table(f"{SF}/documents.parquet")
    counts = {
        d: tk.token_count(txt)
        for d, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    }
    assert len(got) == len(counts)
    by_range: dict = {}
    for d in counts:
        by_range.setdefault(d // range_size, []).append(d)
    for rid, ids in by_range.items():
        ids = np.array(sorted(ids))
        n = np.array([counts[d] for d in ids])
        packs, pos, kept, trunc = pack_greedy(ids, n, max_tokens)
        for i, d in enumerate(ids):
            r = got_by_id[d]
            assert r["pack_id"] == rid * (1 << 32) + packs[i]
            assert r["pack_pos"] == pos[i]
            assert r["packed_tokens"] == kept[i]
            assert r["truncated"] == bool(trunc[i])

    # invariant: no pack exceeds the budget
    fills: dict = {}
    for r in got:
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["packed_tokens"]
        assert r["packed_tokens"] <= max_tokens
    assert all(v <= max_tokens for v in fills.values())

    # block-layout independence: same assignment after a repartition
    got2 = pack_sequences(
        ds.repartition(7), max_tokens=max_tokens, range_size=range_size
    ).take_all()
    assert sorted(map(tuple, (sorted(r.items()) for r in got2))) == sorted(
        map(tuple, (sorted(r.items()) for r in got))
    )


def test_curate_corpus_equals_composed_individual_operators():
    """The fused curation stage must keep exactly the docs the individual
    signal operators would keep under the same thresholds, then dedup by
    min doc_id — curate's one-pass fusion is an optimization, not new
    semantics. (The SQL side of the same contract is the driver oracle.)"""
    from distributed_text_search_ray.pipelines.curate import curate_corpus
    from distributed_text_search_ray.pipelines.dedup import dedup_filter
    from distributed_text_search_ray.pipelines.textstats import repetition_scores

    ds = docs_ds()
    got = sorted(r["doc_id"] for r in curate_corpus(ds).take_all())

    lang = {r["doc_id"]: r["pred_lang"] for r in language_id(ds).take_all()}
    qual = {r["doc_id"]: r for r in quality_scores(ds).take_all()}
    rep = {r["doc_id"]: r for r in repetition_scores(ds).take_all()}
    survivors = [
        d
        for d in lang
        if lang[d] == "en"
        and qual[d]["n_tokens"] >= 20
        and qual[d]["quality"] >= 0.1
        and rep[d]["dup_trigram_frac"] <= 0.05
        and rep[d]["top_bigram_frac"] <= 0.2
    ]
    t = pq.read_table(f"{SF}/documents.parquet")
    texts = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    sub = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(survivors), type=pa.int64()),
                "content": pa.array([texts[d] for d in sorted(survivors)], type=pa.string()),
            }
        )
    )
    want = sorted(r["doc_id"] for r in dedup_filter(sub).take_all())
    assert got == want and len(got) > 0


def test_dup_span_coverage_matches_python_oracle():
    """Per-doc duplicated-window fractions vs an exhaustive in-test oracle:
    plant an identical 12-word span into several docs, keep others fully
    unique, and include a short (<n tokens) doc to pin the one-window CASE
    arm. Partition counts are forced small and awkward so docs/shingles
    genuinely cross group boundaries."""
    from collections import Counter

    from distributed_text_search_ray.functions.tokenize import Tokenizer
    from distributed_text_search_ray.config import AnalyzerConfig
    from distributed_text_search_ray.pipelines.dedup import dup_span_coverage

    rng = np.random.default_rng(7)
    shared = " ".join(f"spanword{k}" for k in range(12))
    ids, texts = [], []
    for i in range(40):
        words = [f"u{i}w{k}" for k in range(int(rng.integers(8, 25)))]
        if i % 4 == 0:  # 10 docs carry the planted span mid-document
            words = words[:5] + shared.split() + words[5:]
        ids.append(i)
        texts.append(" ".join(words))
    ids.append(100)
    texts.append("tiny doc")  # 2 tokens < n=3 -> one window
    ids.append(101)
    texts.append("tiny doc")  # exact dup of the short doc

    tk = Tokenizer(AnalyzerConfig())
    n = 3

    def windows(text):
        toks = tk.tokens(text)
        if not toks:
            return []
        if len(toks) < n:
            return [tuple(toks)]
        return [tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)]

    per_doc = {d: windows(t) for d, t in zip(ids, texts)}
    docs_of = {}
    for d, ws in per_doc.items():
        for w in set(ws):
            docs_of.setdefault(w, set()).add(d)
    expect = {}
    for d, ws in per_doc.items():
        if not ws:
            continue
        dup = sum(1 for w in ws if len(docs_of[w]) >= 2)
        expect[d] = (len(ws), dup, round(dup / len(ws), 6))

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    ).repartition(5)
    out = dup_span_coverage(ds, shingle_partitions=3, doc_partitions=2).take_all()
    got = {
        r["doc_id"]: (r["n_windows"], r["dup_windows"], r["dup_fraction"]) for r in out
    }
    assert got == expect
    # planted-span docs must score strictly above every fully-unique doc
    planted = [got[i][2] for i in range(0, 40, 4)]
    unique = [got[i][2] for i in range(40) if i % 4 != 0]
    assert min(planted) > max(unique) == 0.0
    assert got[100] == (1, 1, 1.0) and got[101] == (1, 1, 1.0)


def test_unigram_logperp_matches_python_oracle():
    """Truncated-vocabulary unigram cross-entropy vs an exhaustive in-test
    oracle, with vocab_size small enough that the OOV-mass path is hit:
    common terms dominate the top-V, rare per-doc terms fall to OOV. Also
    pins the determinism of the top-V tie-break (count desc, term asc)."""
    import math

    from distributed_text_search_ray.config import AnalyzerConfig
    from distributed_text_search_ray.functions.tokenize import Tokenizer
    from distributed_text_search_ray.pipelines.textstats import unigram_logperp

    rng = np.random.default_rng(13)
    common = [f"kw{k}" for k in range(20)]
    ids, texts = [], []
    for i in range(60):
        words = list(rng.choice(common, size=int(rng.integers(10, 30))))
        words += [f"rare{i}x{j}" for j in range(int(rng.integers(1, 6)))]
        rng.shuffle(words)
        ids.append(i)
        texts.append(" ".join(words))
    ids.append(999)
    texts.append("")  # zero tokens -> omitted

    V = 16  # far below the ~20 common + ~200 rare vocabulary
    tk = Tokenizer(AnalyzerConfig())
    from collections import Counter

    counts = Counter()
    for t in texts:
        counts.update(tk.tokens(t))
    total = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:V]
    in_vocab = dict(top)
    oov = total - sum(in_vocab.values())
    expect = {}
    for d, t in zip(ids, texts):
        toks = tk.tokens(t)
        if not toks:
            continue
        nll = [
            -math.log((in_vocab[w] if w in in_vocab else oov) / total) for w in toks
        ]
        expect[d] = (len(toks), round(sum(nll) / len(nll), 6))

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    ).repartition(4)
    out = unigram_logperp(ds, vocab_size=V).take_all()
    got = {r["doc_id"]: (r["n_tokens"], r["logperp"]) for r in out}
    assert set(got) == set(expect)
    for d in expect:
        assert got[d][0] == expect[d][0]
        assert abs(got[d][1] - expect[d][1]) <= 1e-6, (d, got[d], expect[d])
    assert 999 not in got


def test_dup_span_filter_drops_span_heavy_docs():
    """Docs built mostly from a shared span must be dropped at
    max_dup_fraction=0.5; fully-unique docs survive with content intact."""
    from distributed_text_search_ray.pipelines.dedup import (
        dup_span_coverage,
        dup_span_filter,
    )

    shared = " ".join(f"boiler{k}" for k in range(30))
    ids, texts = [], []
    for i in range(12):
        if i % 3 == 0:  # mostly the shared span -> coverage > 0.5
            texts.append(shared + f" tail{i}")
        else:
            texts.append(" ".join(f"u{i}w{k}" for k in range(20)))
        ids.append(i)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    ).repartition(3)
    kept = {r["doc_id"]: r["content"] for r in dup_span_filter(ds, 0.5).take_all()}
    cov = {
        r["doc_id"]: r["dup_fraction"] for r in dup_span_coverage(ds).take_all()
    }
    expect = {d for d, f in cov.items() if f < 0.5}
    assert set(kept) == expect
    assert all(i not in kept for i in range(0, 12, 3))
    for d in kept:
        assert kept[d] == texts[d]


def test_left_anti_join_survives_schema_less_empty_blocks():
    """Regression for the round-2 bench crash: Ray's groupby().map_groups()
    emits schema-less empty blocks for empty hash partitions; a Dataset.join
    partition fed only those raises ArrowInvalid inside acero (BENCH_r02,
    dup_span_filtered). left_anti_join must pin the right side."""
    from distributed_text_search_ray.pipelines.joins import left_anti_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "content": pa.array(["a", "b", "c", "d"]),
            }
        )
    )
    t = pa.table(
        {
            "k": pa.array([1, 1, 2], type=pa.int32()),
            "doc_id": pa.array([2, 2, 3], type=pa.int64()),
        }
    )
    # repartition(4) of 3 rows + a groupby leaves empty hash partitions —
    # the exact shape that produced the schema-less blocks
    right = (
        ray.data.from_arrow(t)
        .repartition(4)
        .groupby("k")
        .map_groups(
            lambda g: pa.table({"doc_id": g.column("doc_id")}),
            batch_format="pyarrow",
        )
    )
    out = left_anti_join(left, right, on="doc_id", num_partitions=4)
    assert sorted(r["doc_id"] for r in out.take_all()) == [1, 4]

    empty = ray.data.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64())}))
    out2 = left_anti_join(left, empty, on="doc_id", num_partitions=4)
    assert sorted(r["doc_id"] for r in out2.take_all()) == [1, 2, 3, 4]


def _span_corpus():
    shared = " ".join(f"boiler{k}" for k in range(30))
    ids, texts = [], []
    for i in range(12):
        if i % 3 == 0:
            texts.append(shared + f" tail{i}")
        else:
            texts.append(" ".join(f"u{i}w{k}" for k in range(20)))
        ids.append(i)
    ids.append(99)
    texts.append("  \n\t ")  # zero-token doc: no coverage row, must be dropped
    return (
        ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "content": pa.array(texts, type=pa.string()),
                }
            )
        ).repartition(3),
        ids,
        texts,
    )


def test_dup_span_filter_after_coverage_same_session():
    """VERDICT r2 item 1: dup_spans then dup_span_filtered in ONE Ray
    session crashed the round-2 suite. Also pins the zero-token-doc drop."""
    from distributed_text_search_ray.pipelines.dedup import (
        dup_span_coverage,
        dup_span_filter,
    )

    ds, ids, texts = _span_corpus()
    cov = {r["doc_id"]: r["dup_fraction"] for r in dup_span_coverage(ds).take_all()}
    kept = {r["doc_id"]: r["content"] for r in dup_span_filter(ds, 0.5).take_all()}
    assert set(kept) == {d for d, f in cov.items() if f < 0.5}
    assert 99 not in kept and 99 not in cov


def test_dup_span_filter_anti_join_matches_broadcast():
    from distributed_text_search_ray.pipelines.dedup import dup_span_filter

    ds, _, _ = _span_corpus()
    base = sorted(
        (r["doc_id"], r["content"]) for r in dup_span_filter(ds, 0.5).take_all()
    )
    anti = sorted(
        (r["doc_id"], r["content"])
        for r in dup_span_filter(ds, 0.5, anti_join=True).take_all()
    )
    assert anti == base and len(base) > 0


def test_near_dedup_filter_anti_join_matches_broadcast():
    from distributed_text_search_ray.pipelines.dedup import near_dedup_filter

    ids, texts = [], []
    for g in range(8):
        base = [f"g{g}w{k}" for k in range(40)]
        for v in range(3):
            words = list(base)
            if v:
                words[v] = f"g{g}v{v}m"
            ids.append(g * 10 + v)
            texts.append(" ".join(words))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(texts, type=pa.string()),
            }
        )
    )
    kw = dict(threshold=0.5, bands=32, pair_partitions=16)
    # anti_join=False: exercise the broadcast drop-set branch explicitly —
    # since the default flipped to the anti-join path, leaving the default
    # here would compare the anti-join path to itself
    base = sorted(
        r["doc_id"] for r in near_dedup_filter(ds, anti_join=False, **kw).take_all()
    )
    anti = sorted(
        r["doc_id"] for r in near_dedup_filter(ds, anti_join=True, **kw).take_all()
    )
    assert anti == base == [g * 10 for g in range(8)]


def test_left_anti_join_random_differential():
    """left_anti_join == set difference on random id multisets (includes
    duplicate right-side keys, which must not change semantics)."""
    rng = np.random.default_rng(17)
    left_ids = rng.choice(2000, size=300, replace=False).astype(np.int64)
    right_ids = rng.choice(2000, size=150, replace=True).astype(np.int64)
    from distributed_text_search_ray.pipelines.joins import left_anti_join

    left = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(left_ids, type=pa.int64()),
                "payload": pa.array([f"p{i}" for i in left_ids]),
            }
        )
    ).repartition(5)
    right = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(right_ids, type=pa.int64())})
    ).repartition(3)
    got = sorted(r["doc_id"] for r in left_anti_join(left, right, on="doc_id").take_all())
    want = sorted(set(left_ids.tolist()) - set(right_ids.tolist()))
    assert got == want


def test_dedup_filter_random_differential():
    """dedup_filter == keep-min-doc_id-per-content on a random dup-heavy
    corpus, across any block layout."""
    rng = np.random.default_rng(23)
    from distributed_text_search_ray.pipelines.dedup import dedup_filter

    contents = [f"content variant {rng.integers(0, 40)}" for _ in range(300)]
    ids = rng.permutation(10_000)[:300].astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(contents, type=pa.string()),
            }
        )
    ).repartition(7)
    got = sorted((r["doc_id"], r["content"]) for r in dedup_filter(ds).take_all())
    first: dict[str, int] = {}
    for d, c in zip(ids.tolist(), contents):
        if c not in first or d < first[c]:
            first[c] = d
    want = sorted((d, c) for c, d in first.items())
    assert got == want


def test_dup_span_edit_matches_python_oracle():
    """dup_span_edit == pure-Python window-cover oracle: tokens covered by
    any cross-doc-duplicated n-gram window are dropped, short docs form one
    window, zero-token docs pass through."""
    import re
    from collections import defaultdict

    from distributed_text_search_ray.pipelines.dedup import dup_span_edit

    shared = " ".join(f"boiler{k}" for k in range(10))
    docs = {
        0: shared + " unique0 tail zero",
        1: "start one " + shared,
        2: "all unique two tokens here completely",
        3: "  \n ",
        4: "tiny doc",
        5: "tiny doc",
        6: "pre " + shared + " mid " + shared,  # two dup spans in one doc
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "content": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    ).repartition(3)
    out = {
        r["doc_id"]: (r["content"], r["n_tokens"], r["n_dropped"])
        for r in dup_span_edit(ds).take_all()
    }

    def tok(t):
        return re.findall(r"[a-z0-9_]+", t.lower())

    n = 3
    wins = {}
    for d, t in docs.items():
        toks = tok(t)
        if not toks:
            wins[d] = []
        elif len(toks) < n:
            wins[d] = [(tuple(toks), 0, len(toks))]
        else:
            wins[d] = [(tuple(toks[i : i + n]), i, i + n) for i in range(len(toks) - n + 1)]
    owners = defaultdict(set)
    for d, ws in wins.items():
        for s, _, _ in ws:
            owners[s].add(d)
    want = {}
    for d, t in docs.items():
        toks = tok(t)
        if not toks:
            want[d] = (t, 0, 0)
            continue
        covered = [False] * len(toks)
        for s, lo, hi in wins[d]:
            if len(owners[s]) >= 2:
                for i in range(lo, hi):
                    covered[i] = True
        kept = [x for x, c in zip(toks, covered) if not c]
        want[d] = (" ".join(kept), len(toks), sum(covered))
    assert out == want
    assert out[0][2] == 10 and out[4][0] == "" and out[3][0] == docs[3]


def test_dup_span_edit_random_small_alphabet():
    """Randomized differential: a 3-letter vocabulary forces heavy n-gram
    collisions, overlapping dup windows, repeated tokens and whole-doc
    drops — one seeded corpus, engine vs the pure-Python cover oracle."""
    import re
    from collections import defaultdict

    from distributed_text_search_ray.pipelines.dedup import dup_span_edit

    rng = np.random.default_rng(41)
    words = ["aa", "bb", "cc"]
    docs = {
        i: " ".join(rng.choice(words, rng.integers(0, 9)).tolist())
        for i in range(40)
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "content": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    ).repartition(5)
    out = {
        r["doc_id"]: (r["content"], r["n_tokens"], r["n_dropped"])
        for r in dup_span_edit(ds).take_all()
    }

    def tok(t):
        return re.findall(r"[a-z0-9_]+", t.lower())

    n = 3
    wins = {}
    for d, t in docs.items():
        toks = tok(t)
        if not toks:
            wins[d] = []
        elif len(toks) < n:
            wins[d] = [(tuple(toks), 0, len(toks))]
        else:
            wins[d] = [(tuple(toks[i : i + n]), i, i + n) for i in range(len(toks) - n + 1)]
    owners = defaultdict(set)
    for d, ws in wins.items():
        for s, _, _ in ws:
            owners[s].add(d)
    for d, t in docs.items():
        toks = tok(t)
        if not toks:
            assert out[d] == (t, 0, 0)
            continue
        covered = [False] * len(toks)
        for s, lo, hi in wins[d]:
            if len(owners[s]) >= 2:
                for i in range(lo, hi):
                    covered[i] = True
        kept = [x for x, c in zip(toks, covered) if not c]
        assert out[d] == (" ".join(kept), len(toks), sum(covered)), d


def test_token_budget_sample_properties():
    """Budget is met-not-undershot (last kept doc crosses it), selection is
    deterministic under any block layout, unlisted groups are dropped, and
    a non-empty listed group contributes at least one doc even when its
    first doc alone exceeds the budget."""
    from distributed_text_search_ray.pipelines.textstats import token_budget_sample

    rng = np.random.default_rng(9)
    rows = []
    for i in range(60):
        lang = ["en", "fr", "zz"][i % 3]
        n = int(rng.integers(3, 30))
        rows.append((i, " ".join(f"w{i}t{k}" for k in range(n)), lang))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "content": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
        }
    )
    budgets = {"en": 100, "fr": 1}  # fr=1: first doc alone must cross it
    a = sorted(
        tuple(r.values())
        for r in token_budget_sample(
            ray.data.from_arrow(t).repartition(7), budgets, salt="s"
        ).take_all()
    )
    b = sorted(
        tuple(r.values())
        for r in token_budget_sample(
            ray.data.from_arrow(t).repartition(2), budgets, salt="s"
        ).take_all()
    )
    assert a == b and a  # block-layout determinism
    by_lang = {}
    for d, lang, n in a:
        by_lang.setdefault(lang, []).append((d, n))
    assert set(by_lang) == {"en", "fr"}  # zz dropped
    assert len(by_lang["fr"]) == 1  # budget 1 -> exactly the crossing doc
    en_total = sum(n for _, n in by_lang["en"])
    en_max = max(n for _, n in by_lang["en"])
    assert en_total >= 100 and en_total - en_max < 100  # met, minimally


def test_chunk_documents_coverage_and_overlap():
    """Every token appears in some chunk, consecutive chunks overlap by
    exactly `overlap` (except a shorter tail), no chunk is contained in its
    predecessor, and short/zero-token docs behave."""
    from distributed_text_search_ray.pipelines.textstats import chunk_documents

    docs = {
        0: " ".join(f"t{k}" for k in range(130)),  # multi-chunk
        1: " ".join(f"s{k}" for k in range(10)),   # single chunk
        2: "   ",                                   # zero tokens -> none
        3: " ".join(f"u{k}" for k in range(65)),   # nt just over max
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "content": pa.array(list(docs.values()), type=pa.string()),
            }
        )
    ).repartition(2)
    out = {}
    for r in chunk_documents(ds, max_tokens=64, overlap=16).take_all():
        out.setdefault(r["doc_id"], []).append((r["chunk_id"], r["content"], r["n_tokens"]))
    assert 2 not in out
    assert len(out[1]) == 1 and out[1][0][1] == docs[1] and out[1][0][2] == 10
    for d in (0, 3):
        chunks = sorted(out[d])
        toks = docs[d].split()
        nt = len(toks)
        stride = 48
        covered = set()
        for i, text, n in chunks:
            ctoks = text.split()
            assert ctoks == toks[i * stride : i * stride + len(ctoks)]
            assert n == len(ctoks) <= 64
            covered.update(range(i * stride, i * stride + len(ctoks)))
        assert covered == set(range(nt))  # full coverage
        # chunk count formula
        want_n = 1 if nt <= 64 else -(-(nt - 16) // 48)
        assert len(chunks) == want_n


def test_embedding_dedup_filter_keeps_cluster_min():
    """Planted cosine-dup clusters: each keeps exactly its min vec_id;
    dissimilar singletons all survive; anti_join path identical."""
    from distributed_text_search_ray.pipelines.ann import embedding_dedup_filter

    rng = np.random.default_rng(6)
    ids, vecs = [], []
    for g in range(5):
        base = rng.standard_normal(16)
        base /= np.linalg.norm(base)
        for v in range(3):
            e = base + rng.standard_normal(16) * 0.01
            ids.append(g * 10 + v)
            vecs.append((e / np.linalg.norm(e)).tolist())
    for s in range(6):  # orthogonal-ish singletons
        e = rng.standard_normal(16)
        ids.append(1000 + s)
        vecs.append((e / np.linalg.norm(e)).tolist())
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        )
    ).repartition(4)
    kept = sorted(
        r["vec_id"] for r in embedding_dedup_filter(ds, threshold=0.95).take_all()
    )
    want = sorted([g * 10 for g in range(5)] + [1000 + s for s in range(6)])
    assert kept == want


def test_ann_filtered_topk_matches_numpy_prefilter():
    """Pre-filter semantics: each query's top-k is computed over ONLY its
    label range — identical to masking the candidate set before ranking,
    and different from post-filtering an unfiltered top-k."""
    from distributed_text_search_ray.pipelines.ann import ann_filtered_topk

    t = _emb_table()
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    ranges = [(0, 3), (4, 7), (8, 9)]
    queries = [
        (int(ids[i]), X[i].tolist(), lo, hi) for i, (lo, hi) in enumerate(ranges)
    ]
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = ann_filtered_topk(ds, queries, k=5).take_all()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for qid, qv, lo, hi in queries:
        qn = np.array(qv) / np.linalg.norm(qv)
        sims = np.round(Xn @ qn, 6)
        mask = (ids != qid) & (labels >= lo) & (labels <= hi)
        order = np.lexsort((ids[mask], -sims[mask]))[:5]
        want = list(zip(ids[mask][order].tolist(), sims[mask][order].tolist()))
        mine = [
            (r["vec_id"], r["cosine"])
            for r in sorted(
                (x for x in got if x["query_vec_id"] == qid), key=lambda r: r["rank"]
            )
        ]
        assert mine == want
        # every returned neighbor honors the filter
        by_id = dict(zip(ids.tolist(), labels.tolist()))
        assert all(lo <= by_id[v] <= hi for v, _ in mine)
