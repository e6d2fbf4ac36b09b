"""General */? wildcard term queries (mid-pattern, not just prefixes)."""

import re

import numpy as np

from distributed_text_search_ray.functions.tokenize import tokenizer_for
from distributed_text_search_ray.pipelines.search import (
    wildcard_term_search,
    wildcard_to_like,
    wildcard_topk_search,
)

from tests.conftest import corpus_docs

PATTERNS = [
    (0, "d?f"),
    (1, "*ize"),
    (2, "tok*n*"),
    (3, "zz?q*x"),
    (4, "d*a"),
]


def _wc_regex(pattern: str) -> re.Pattern:
    out = []
    for ch in pattern.lower():
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out))


def test_wildcard_stats_match_bruteforce(built_index_r3):
    corpus_dir, index_dir = built_index_r3
    docs = corpus_docs(corpus_dir)
    tk = tokenizer_for(None)
    toks = {d: tk.tokens(t) for d, t in docs}

    got = {
        r["query_id"]: (r["n_matching_terms"], r["n_docs"], r["n_occurrences"])
        for r in wildcard_term_search(index_dir, PATTERNS).take_all()
    }
    vocab = sorted({t for ts in toks.values() for t in ts})
    for qid, pat in PATTERNS:
        rx = _wc_regex(pat)
        matched = {t for t in vocab if rx.fullmatch(t)}
        n_docs = sum(1 for ts in toks.values() if matched & set(ts))
        occ = sum(sum(1 for t in ts if t in matched) for ts in toks.values())
        assert got[qid] == (len(matched), n_docs, occ), (pat, got[qid])
    # at least one mid-pattern case must actually fan out, or the test
    # would pass vacuously on empty matches
    assert got[2][0] >= 1 and got[4][0] >= 1


def test_wildcard_to_like_escapes_literals():
    assert wildcard_to_like("Da?a_*%x\\") == "da_a\\_%\\%x\\\\"


def test_wildcard_topk_is_or_query_over_expansion(built_index_r3):
    from distributed_text_search_ray.pipelines.search import search_topk

    corpus_dir, index_dir = built_index_r3
    docs = corpus_docs(corpus_dir)
    tk = tokenizer_for(None)
    vocab = sorted({t for _, text in docs for t in tk.tokens(text)})
    rx = _wc_regex("tok*n*")
    terms = [t for t in vocab if rx.fullmatch(t)]
    assert terms
    # wildcard retrieval == plain OR query over the expanded term set
    want = search_topk(index_dir, [(2, " ".join(terms))], topk=5).take_all()
    got = [
        r
        for r in wildcard_topk_search(index_dir, PATTERNS, topk=5).take_all()
        if r["query_id"] == 2
    ]
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
