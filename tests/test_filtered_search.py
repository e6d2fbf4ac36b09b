"""Attribute-filtered BM25: sidecar build + filtered top-k vs brute oracle."""

import numpy as np
import pytest

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.pipelines.build import build_index
from distributed_text_search_ray.pipelines.search import (
    load_attribute_ids,
    search_topk,
    search_topk_filtered,
)


@pytest.fixture(scope="module")
def attr_index(code_corpus, tmp_path_factory):
    corpus_dir, _ = code_corpus
    idx = str(tmp_path_factory.mktemp("fidx") / "idx")
    cfg = IndexConfig(num_partitions=4, attribute_columns=("lang",))
    rep = build_index(corpus_dir, idx, cfg)
    return corpus_dir, idx, rep


def _lang_of_docs(corpus_dir):
    import pyarrow.parquet as pq

    from distributed_text_search_ray.sources.corpus import corpus_files

    out = {}
    for f in corpus_files(corpus_dir):
        t = pq.read_table(f, columns=["repo", "path", "lang"])
        from distributed_text_search_ray.functions.hashing import doc_fingerprint

        for r in t.to_pylist():
            out[doc_fingerprint(r["repo"], r["path"])] = r["lang"]
    return out


def test_attribute_sidecar_written_and_loadable(attr_index, code_corpus):
    corpus_dir, idx, _ = attr_index
    langs = _lang_of_docs(corpus_dir)
    for value in sorted(set(langs.values())):
        ids = load_attribute_ids(idx, "lang", value)
        want = np.sort(np.array([d for d, l in langs.items() if l == value]))
        assert np.array_equal(ids, want)


def test_filtered_topk_is_unfiltered_ranking_restricted(attr_index, code_corpus):
    corpus_dir, idx, _ = attr_index
    langs = _lang_of_docs(corpus_dir)
    queries = [(0, "def return"), (1, "import")]
    # unfiltered ranking with a huge k = full scored list
    full = search_topk(idx, queries, topk=10_000, mode="taat").take_all()
    for value in ("py", "c"):
        got = [
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in sorted(
                search_topk_filtered(idx, queries, "lang", value, topk=5).take_all(),
                key=lambda r: (r["query_id"], r["rank"]),
            )
        ]
        want = []
        for qid in (0, 1):
            kept = [
                r for r in full if r["query_id"] == qid and langs[r["doc_id"]] == value
            ]
            kept.sort(key=lambda r: (-r["score"], r["doc_id"]))
            for i, r in enumerate(kept[:5], start=1):
                want.append((qid, i, r["doc_id"], r["score"]))
        assert got == want
        assert want  # fixture yields matches in both langs


def test_filtered_modes_agree(attr_index):
    _, idx, _ = attr_index
    queries = [(0, "def return import")]
    taat = search_topk_filtered(idx, queries, "lang", "py", topk=5, mode="taat").take_all()
    ms = search_topk_filtered(idx, queries, "lang", "py", topk=5, mode="maxscore").take_all()
    assert [tuple(r.values()) for r in taat] == [tuple(r.values()) for r in ms]
    with pytest.raises(Exception):
        search_topk_filtered(idx, queries, "lang", "py", mode="wand").take_all()


def test_more_like_this_excludes_source_and_ranks(attr_index, code_corpus):
    import pyarrow as pa
    import ray.data

    from distributed_text_search_ray.pipelines.search import more_like_this
    from tests.conftest import corpus_docs

    corpus_dir, idx, _ = attr_index
    docs = corpus_docs(corpus_dir)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "content": pa.array([c for _, c in docs], type=pa.string()),
            }
        )
    )
    src = [docs[0][0], docs[7][0]]
    rows = more_like_this(idx, ds, src, top_terms=5, topk=5).take_all()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src_doc_id"], []).append(r)
    assert set(by_src) == set(src)
    for s, rs in by_src.items():
        assert all(r["doc_id"] != s for r in rs)  # self excluded
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
    # deterministic across reruns
    rows2 = more_like_this(idx, ds, src, top_terms=5, topk=5).take_all()
    assert sorted(map(tuple, (r.values() for r in rows))) == sorted(
        map(tuple, (r.values() for r in rows2))
    )


def test_missing_sidecar_raises(code_corpus, tmp_path):
    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, IndexConfig(num_partitions=4))  # no attrs
    with pytest.raises(FileNotFoundError):
        load_attribute_ids(idx, "lang", "py")


def test_sidecar_survives_resume(attr_index):
    corpus_dir, idx, _ = attr_index
    rep2 = build_index(
        corpus_dir, idx, IndexConfig(num_partitions=4, attribute_columns=("lang",))
    )
    assert rep2.get("skipped")
    assert len(load_attribute_ids(idx, "lang", "py")) > 0


def test_boolean_filtered_topk_matches_oracle(built_index_r3):
    """Lucene-style filter query: BM25 ranking restricted to boolean-matching
    docs; filter terms gate but do not score. Also a regression for the
    empty-filtered-postings crash: the ranked query contains a term the
    filter excludes ENTIRELY (global df > 0, filtered postings empty)."""
    import numpy as np

    from distributed_text_search_ray.functions.tokenize import Tokenizer
    from distributed_text_search_ray.oracle import bm25_scores, build_oracle_index, topk
    from distributed_text_search_ray.pipelines.search import search_topk_boolean_filtered
    from tests.conftest import corpus_docs

    corpus_dir, index_dir = built_index_r3
    docs = corpus_docs(corpus_dir)
    filter_query = "def AND NOT import"
    queries = [(0, "import data"), (1, "merge index"), (2, "zzz_nothing")]

    from distributed_text_search_ray.config import IndexConfig

    cfg = IndexConfig()
    idx = build_oracle_index(docs, cfg.analyzer)
    tk = Tokenizer(cfg.analyzer)
    have_def = {d for d, _ in idx.postings.get("def", [])}
    have_imp = {d for d, _ in idx.postings.get("import", [])}
    allowed = have_def - have_imp
    expected = []
    for qid, qtext in queries:
        scores = bm25_scores(idx, tk.tokens(qtext), cfg.bm25_k1, cfg.bm25_b)
        scores = {d: s for d, s in scores.items() if d in allowed}
        for rank, doc_id, s in topk(scores, 5):
            expected.append((qid, rank, doc_id, s))

    rows = search_topk_boolean_filtered(index_dir, queries, filter_query, topk=5).take_all()
    got = sorted((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows)
    assert got == sorted(expected)
    # query 0's "import" term is globally present but filter-excluded — the
    # ranking must come from "data" alone, not crash
    assert any(q == 0 for q, *_ in got)


def test_range_filtered_topk(tmp_path):
    """Numeric range filter over a sidecar attribute: ranking restricted to
    docs with lo <= attr <= hi, surviving scores unchanged."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.search import (
        search_topk,
        search_topk_filtered_range,
    )

    texts = ["alpha beta " * i for i in range(1, 7)]  # lengths scale with i
    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * 6,
                "path": [f"{i}.py" for i in range(6)],
                "commit": ["c"] * 6,
                "lang": ["py"] * 6,
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
                "content": texts,
            }
        ),
        str(d / "shard_00000.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(d), idx, IndexConfig(num_partitions=2, attribute_columns=("n_chars",)))
    lens = {len(t) for t in texts}
    lo, hi = sorted(lens)[1], sorted(lens)[3]  # keep the middle band
    rows = search_topk_filtered_range(idx, [(0, "alpha")], "n_chars", lo=lo, hi=hi, topk=10).take_all()
    full = {r["doc_id"]: r["score"] for r in search_topk(idx, [(0, "alpha")], topk=10).take_all()}
    assert len(rows) == 3
    for r in rows:
        assert r["score"] == full[r["doc_id"]]  # unfiltered scores preserved
