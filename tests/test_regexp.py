"""Whole-term regexp term queries (Lucene RegexpQuery analog).

Differential oracle: Python ``re.fullmatch`` over the brute-force
vocabulary (a third regex engine, independent of both RE2 embeddings the
driver gate compares — Arrow's and DuckDB's).
"""

import re

from distributed_text_search_ray.functions.tokenize import tokenizer_for
from distributed_text_search_ray.pipelines.search import (
    regexp_anchor,
    regexp_term_search,
    regexp_topk_search,
)

from tests.conftest import corpus_docs

PATTERNS = [
    (0, "d.f"),
    (1, ".*ize"),
    (2, "tok.n.*"),
    (3, "zz+q"),
    (4, "d(ata|oc)[0-9]*"),
]


def test_regexp_stats_match_bruteforce(built_index_r3):
    corpus_dir, index_dir = built_index_r3
    docs = corpus_docs(corpus_dir)
    tk = tokenizer_for(None)
    toks = {d: tk.tokens(t) for d, t in docs}

    got = {
        r["query_id"]: (r["n_matching_terms"], r["n_docs"], r["n_occurrences"])
        for r in regexp_term_search(index_dir, PATTERNS).take_all()
    }
    vocab = sorted({t for ts in toks.values() for t in ts})
    for qid, pat in PATTERNS:
        rx = re.compile(pat.lower())
        matched = {t for t in vocab if rx.fullmatch(t)}
        n_docs = sum(1 for ts in toks.values() if matched & set(ts))
        occ = sum(sum(1 for t in ts if t in matched) for ts in toks.values())
        assert got[qid] == (len(matched), n_docs, occ), (pat, got[qid])
    # the alternation and dot-tail cases must actually fan out, or the
    # test would pass vacuously on empty matches
    assert got[2][0] >= 1 and got[4][0] >= 1
    assert got[3] == (0, 0, 0)


def test_regexp_anchor_wraps_alternation():
    # top-level alternation must stay inside the anchors: '^(?:a|b)$',
    # never '^a|b$' (which would match 'a...' prefixes and '...b' suffixes)
    assert regexp_anchor("Ab|cD") == "^(?:ab|cd)$"


def test_regexp_topk_is_or_query_over_expansion(built_index_r3):
    from distributed_text_search_ray.pipelines.search import search_topk

    corpus_dir, index_dir = built_index_r3
    docs = corpus_docs(corpus_dir)
    tk = tokenizer_for(None)
    vocab = sorted({t for _, text in docs for t in tk.tokens(text)})
    rx = re.compile("tok.n.*")
    terms = [t for t in vocab if rx.fullmatch(t)]
    assert terms
    # regexp retrieval == plain OR query over the expanded term set
    want = search_topk(index_dir, [(2, " ".join(terms))], topk=5).take_all()
    got = [
        r
        for r in regexp_topk_search(index_dir, PATTERNS, topk=5).take_all()
        if r["query_id"] == 2
    ]
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
