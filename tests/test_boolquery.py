"""Boolean retrieval: grammar, precedence, and index-eval vs brute force."""

import re

import pyarrow as pa
import pytest
import ray.data

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.pipelines.boolquery import (
    Lit,
    boolean_search,
    parse_boolean_query,
)


def test_parse_dnf_and_precedence():
    assert parse_boolean_query("a") == [[Lit("a", False)]]
    assert parse_boolean_query("a AND b OR c") == [
        [Lit("a", False), Lit("b", False)],
        [Lit("c", False)],
    ]
    assert parse_boolean_query("a AND NOT b") == [[Lit("a", False), Lit("b", True)]]


@pytest.mark.parametrize(
    "bad",
    ["", "AND x", "x OR", "NOT x", "x AND NOT NOT y", "a b", "x OR NOT y", "OR x"],
)
def test_parse_rejects_invalid(bad):
    with pytest.raises(ValueError):
        parse_boolean_query(bad)


def test_boolean_search_matches_brute(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.build import build_index
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, IndexConfig(num_partitions=4))
    docs = corpus_docs(corpus_dir)
    toksets = {d: set(re.findall(r"[a-z0-9_]+", c.lower())) for d, c in docs}
    # pick three real terms with different dfs
    from collections import Counter

    df = Counter(t for s in toksets.values() for t in s)
    terms = [t for t, _ in df.most_common()]
    a, b, c = terms[0], terms[len(terms) // 2], terms[-1]
    queries = [
        (0, f"{a} AND {b}"),
        (1, f"{b} OR {c}"),
        (2, f"{a} AND NOT {b}"),
        (3, f"{a} AND {b} OR {c} AND NOT {a}"),
        (4, f"zzz_never_a_term OR {c}"),
    ]
    got = {
        (r["query_id"], r["doc_id"])
        for r in boolean_search(idx, queries).take_all()
    }
    want = set()
    for d, s in toksets.items():
        if a in s and b in s:
            want.add((0, d))
        if b in s or c in s:
            want.add((1, d))
        if a in s and b not in s:
            want.add((2, d))
        if (a in s and b in s) or (c in s and a not in s):
            want.add((3, d))
        if c in s:
            want.add((4, d))
    assert got == want
    assert want  # non-trivial fixture


def test_facet_counts_match_brute(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.boolquery import facet_counts
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    from distributed_text_search_ray.pipelines.build import build_index

    build_index(
        corpus_dir, idx, IndexConfig(num_partitions=4, attribute_columns=("lang",))
    )
    docs = corpus_docs(corpus_dir)
    import pyarrow.parquet as pq

    from distributed_text_search_ray.sources.corpus import corpus_files
    from distributed_text_search_ray.functions.hashing import doc_fingerprint

    langs = {}
    for f in corpus_files(corpus_dir):
        for r in pq.read_table(f, columns=["repo", "path", "lang"]).to_pylist():
            langs[doc_fingerprint(r["repo"], r["path"])] = r["lang"]
    toksets = {d: set(re.findall(r"[a-z0-9_]+", c.lower())) for d, c in docs}
    from collections import Counter

    df = Counter(t for s in toksets.values() for t in s)
    a = df.most_common(1)[0][0]
    got = {
        (r["query_id"], r["value"]): r["n_docs"]
        for r in facet_counts(idx, [(0, a)], attr="lang").take_all()
    }
    want = Counter(langs[d] for d, s in toksets.items() if a in s)
    assert got == {(0, v): n for v, n in want.items()}
    assert len(got) > 1  # fixture spans several langs


def test_boolean_search_analyzer_folds_case(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.build import build_index
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, IndexConfig(num_partitions=4))
    docs = corpus_docs(corpus_dir)
    term = next(iter(re.findall(r"[a-z0-9_]+", docs[0][1].lower())))
    lower = boolean_search(idx, [(0, term)]).take_all()
    upper = boolean_search(idx, [(0, term.upper())]).take_all()
    assert lower and sorted(map(tuple, (r.values() for r in lower))) == sorted(
        map(tuple, (r.values() for r in upper))
    )


def test_significant_terms_matches_python_oracle(code_corpus, tmp_path):
    """Lift math + salted-term fg re-aggregation vs a brute-force oracle.
    salt_df_threshold=0.5 forces hot terms to split across partitions, so the
    per-term groupby sum (not any single partition's partial) must produce
    the foreground df."""
    import re as _re
    from collections import Counter

    import numpy as np

    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.significant import significant_terms
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(
        corpus_dir,
        idx,
        IndexConfig(num_partitions=4, salt_buckets=2, salt_df_threshold=0.5),
    )
    docs = corpus_docs(corpus_dir)
    toksets = {d: set(_re.findall(r"[a-z0-9_]+", c.lower())) for d, c in docs}
    df = Counter(t for s in toksets.values() for t in s)
    terms = [t for t, _ in df.most_common()]
    a, b = terms[0], terms[len(terms) // 2]
    queries = [(0, f"{a} AND {b}"), (1, f"{a} AND NOT {b}")]

    got = significant_terms(idx, queries, topn=8).take_all()
    N = len(toksets)
    for qid, pred in ((0, lambda s: a in s and b in s), (1, lambda s: a in s and b not in s)):
        hits = [d for d, s in toksets.items() if pred(s)]
        fg = Counter(t for d in hits for t in toksets[d])
        scored = [
            (
                round(
                    (c / len(hits)) / (df[t] / N),
                    6,
                ),
                c,
                t,
            )
            for t, c in fg.items()
        ]
        want = sorted(scored, key=lambda x: (-x[0], -x[1], x[2]))[:8]
        mine = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [(r["term"], r["fg_df"], r["bg_df"]) for r in mine] == [
            (t, c, df[t]) for _, c, t in want
        ]
        assert np.allclose(
            [r["lift"] for r in mine], [l for l, _, _ in want], atol=1e-9
        )
