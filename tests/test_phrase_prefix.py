"""Pin match_phrase_prefix (ES search-as-you-type).

Contract: last token expands to the FIRST max_expansions dictionary terms
with that prefix in sorted term order (Lucene cap); preceding tokens chain
consecutively; n_occurrences counts start positions. Differential vs a
pure-Python exhaustive oracle, incl. a tight cap that actually truncates."""

import re

import pytest

from distributed_text_search_ray import IndexConfig
from distributed_text_search_ray.pipelines.build import build_index
from distributed_text_search_ray.pipelines.phrase import match_phrase_prefix

from tests.conftest import corpus_docs

QUERIES = [
    (0, "def tok"),        # exact + prefix
    (1, "par"),            # pure prefix (k == 1)
    (2, "the quick zz"),   # no expansion -> no rows
    (3, "spark tab"),
]


def _brute(docs, queries, max_exp):
    tok = lambda s: re.findall(r"[a-z0-9_]+", s.lower())
    toks = {d: tok(c) for d, c in docs}
    vocab = sorted({t for ts in toks.values() for t in ts})
    out = []
    for qid, q in queries:
        terms = tok(q)
        if not terms:
            continue
        exact, prefix = terms[:-1], terms[-1]
        exp = set([t for t in vocab if t.startswith(prefix)][:max_exp])
        if not exp:
            continue
        for d, ts in toks.items():
            n = 0
            k = len(terms)
            for s in range(len(ts) - k + 1):
                if ts[s : s + k - 1] == exact and ts[s + k - 1] in exp:
                    n += 1
            if n:
                out.append((qid, d, n))
    return sorted(out)


@pytest.fixture(scope="module")
def pos_index(code_corpus, tmp_path_factory):
    corpus_dir, _ = code_corpus
    idx = str(tmp_path_factory.mktemp("ppfx") / "idx")
    build_index(
        corpus_dir, idx, IndexConfig(num_partitions=4, store_positions=True)
    )
    return corpus_dir, idx


@pytest.mark.parametrize("max_exp", [50, 3])
def test_match_phrase_prefix_vs_brute(pos_index, max_exp):
    corpus_dir, idx = pos_index
    docs = corpus_docs(corpus_dir)
    got = sorted(
        (r["query_id"], r["doc_id"], r["n_occurrences"])
        for r in match_phrase_prefix(idx, QUERIES, max_expansions=max_exp).take_all()
    )
    assert got == _brute(docs, QUERIES, max_exp)
    if max_exp == 3:
        # the tight cap must actually TRUNCATE some query's expansion set
        # (the result rows may or may not change; the oracle handles both)
        tok = lambda s: re.findall(r"[a-z0-9_]+", s.lower())
        vocab = sorted({t for _, c in docs for t in tok(c)})
        assert any(
            len([t for t in vocab if t.startswith(tok(q)[-1])]) > 3
            for _, q in QUERIES
            if tok(q)
        )
