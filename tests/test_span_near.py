"""Pin ordered span-near search (Lucene span_near, in_order=true).

Contract: query tokens, in query order with duplicates preserved, at
strictly increasing positions; gap = p_last - p_first - (k-1) interposed
positions; match iff min gap <= slop. Differential vs a pure-Python
exhaustive-chain oracle and vs the DuckDB min-join-chain oracle.
"""

import re

import pytest

from distributed_text_search_ray import IndexConfig


def _brute_span_near(docs: dict, queries, slop):
    """Exhaustive ordered-chain oracle: min over ALL strictly-increasing
    position assignments (dynamic programming per doc, not greedy — so it
    independently validates the operator's greedy-is-optimal claim)."""
    out = []
    for qid, q in queries:
        terms = re.findall(r"[a-z0-9_]+", q.lower())
        if not terms:
            continue
        k = len(terms)
        for d, content in docs.items():
            toks = re.findall(r"[a-z0-9_]+", content.lower())
            pos = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
            if any(not pos[t] for t in terms):
                continue
            best = None
            for p1 in pos[terms[0]]:
                cur = p1
                ok = True
                for t in terms[1:]:
                    nxt = [p for p in pos[t] if p > cur]
                    if not nxt:
                        ok = False
                        break
                    cur = min(nxt)
                if ok:
                    g = cur - p1 - (k - 1)
                    best = g if best is None else min(best, g)
            if best is not None and best <= slop:
                out.append((qid, d, best))
    return sorted(out)


def _positional_index(code_corpus, tmp_path, **kw):
    from distributed_text_search_ray.pipelines.build import build_index

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(
        corpus_dir,
        idx,
        IndexConfig(num_partitions=4, store_positions=True, **kw),
    )
    return corpus_dir, idx


def test_span_near_matches_brute(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.phrase import span_near_search
    from tests.conftest import corpus_docs

    corpus_dir, idx = _positional_index(
        code_corpus, tmp_path, salt_buckets=3, salt_df_threshold=0.05
    )
    docs = dict(corpus_docs(corpus_dir))
    toks = re.findall(r"[a-z0-9_]+", list(docs.values())[0].lower())
    queries = [
        (0, f"{toks[0]} {toks[5]}"),
        (1, f"{toks[0]} {toks[3]} {toks[7]}"),
        (2, f"{toks[5]} {toks[0]}"),        # reversed order != query 0
        (3, toks[1]),                       # single term -> gap 0
        (4, f"{toks[0]} zz_missing"),       # absent term -> no rows
        (5, f"{toks[2]} {toks[2]}"),        # duplicate: needs TWO occurrences
        (6, "data data data"),              # triple repeat of a common token
    ]
    got = sorted(
        (r["query_id"], r["doc_id"], r["min_gap"])
        for r in span_near_search(idx, queries, slop=12).take_all()
    )
    assert got == _brute_span_near(docs, queries, 12)
    assert any(q == 3 and g == 0 for q, _, g in got)
    assert not any(q == 4 for q, _, _ in got)


def test_span_near_order_sensitivity(code_corpus, tmp_path):
    """Ordered semantics: 'a b' and 'b a' disagree somewhere the unordered
    proximity operator would not, and both are subsets of proximity hits."""
    from distributed_text_search_ray.pipelines.phrase import (
        proximity_search,
        span_near_search,
    )

    _, idx = _positional_index(code_corpus, tmp_path)
    fwd = {
        (r["doc_id"], r["min_gap"])
        for r in span_near_search(idx, [(0, "data index")], slop=8).take_all()
    }
    rev = {
        (r["doc_id"], r["min_gap"])
        for r in span_near_search(idx, [(0, "index data")], slop=8).take_all()
    }
    assert fwd and rev and fwd != rev
    # unordered proximity with max_span = slop + (k-1) covers both orders
    prox = {
        r["doc_id"]
        for r in proximity_search(idx, [(0, "data index")], max_span=9).take_all()
    }
    assert {d for d, _ in fwd} <= prox and {d for d, _ in rev} <= prox


def test_span_near_slop0_is_exact_phrase(code_corpus, tmp_path):
    """slop=0 on a distinct-token query == consecutive-positions phrase
    match (same doc set as phrase_search_positional)."""
    from distributed_text_search_ray.pipelines.phrase import (
        phrase_search_positional,
        span_near_search,
    )

    _, idx = _positional_index(code_corpus, tmp_path)
    q = [(0, "data index")]
    near = {r["doc_id"] for r in span_near_search(idx, q, slop=0).take_all()}
    phrase = {r["doc_id"] for r in phrase_search_positional(idx, q).take_all()}
    assert near == phrase and near


def test_span_near_sql_oracle_agrees(code_corpus, tmp_path):
    import duckdb

    from distributed_text_search_ray.pipelines.phrase import (
        span_near_search,
        span_near_sql,
    )
    from tests.conftest import corpus_docs

    corpus_dir, idx = _positional_index(code_corpus, tmp_path)
    docs = corpus_docs(corpus_dir)
    con = duckdb.connect()
    con.execute('CREATE TABLE documents (doc_id BIGINT, "text" VARCHAR)')
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    tok_sql = (
        "list_filter(string_split_regex(lower(\"text\"), '[^a-z0-9_]+'), x -> x <> '')"
    )
    toks = re.findall(r"[a-z0-9_]+", docs[0][1].lower())
    queries = [
        (0, f"{toks[0]} {toks[5]}"),
        (1, f"{toks[1]} {toks[4]} {toks[9]}"),
        (2, "data data"),
        (3, toks[2]),
    ]
    got = sorted(
        (r["query_id"], r["doc_id"], r["min_gap"])
        for r in span_near_search(idx, queries, slop=10).take_all()
    )
    want = []
    for qid, q in queries:
        want.extend(
            tuple(r) for r in con.execute(span_near_sql(q, qid, 10, tok_sql)).fetchall()
        )
    assert got == sorted(want) and got


def test_span_near_rejects_bad_slop(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.phrase import _SpanNearExecutor

    _, idx = _positional_index(code_corpus, tmp_path)
    with pytest.raises(ValueError):
        _SpanNearExecutor(idx, slop=-1)
