"""Phrase (positional) search: scan path vs indexed path vs brute oracle."""

import re

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.pipelines.phrase import (
    phrase_match_counts,
    phrase_search_indexed,
)

SF = "/root/testdata/sf0.001"


def _brute(texts: dict[int, str], phrases) -> set[tuple[int, int, int]]:
    def toks(s):
        return re.findall(r"[a-z0-9_]+", s.lower())

    out = set()
    for qid, p in phrases:
        pt = toks(p)
        if not pt:
            continue
        for d, tx in texts.items():
            tt = toks(tx)
            n = sum(
                1 for i in range(len(tt) - len(pt) + 1) if tt[i : i + len(pt)] == pt
            )
            if n:
                out.add((qid, d, n))
    return out


def _rows(ds) -> set[tuple[int, int, int]]:
    return {(r["query_id"], r["doc_id"], r["n_occurrences"]) for r in ds.take_all()}


def test_phrase_scan_overlaps_and_boundaries():
    """Overlapping matches each count (reference count semantics, SURVEY.md
    section 8.2); matches never straddle documents; repeated-token phrases
    work; punctuation-split tokens match across the split."""
    texts = {
        1: "ab ab ab ab",          # "ab ab" occurs 3x (overlapping)
        2: "xx yy; xx, yy",        # "yy xx" occurs once, across punctuation
        3: "lone",
        4: "ab",                   # half of "ab ab" at a doc end
        5: "",                     # empty doc
    }
    phrases = [(0, "ab ab"), (1, "yy xx"), (2, "lone"), (3, "missing pair")]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), type=pa.int64()),
                "content": pa.array(list(texts.values()), type=pa.string()),
            }
        )
    )
    got = _rows(phrase_match_counts(ds, phrases))
    assert got == {(0, 1, 3), (1, 2, 1), (2, 3, 1)}
    assert got == _brute(texts, phrases)


def test_phrase_indexed_matches_scan(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.build import build_index
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, IndexConfig(num_partitions=4))
    docs = corpus_docs(corpus_dir)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "content": pa.array([c for _, c in docs], type=pa.string()),
            }
        )
    )
    # pick a real bigram from the corpus so matches exist
    first_tokens = re.findall(r"[a-z0-9_]+", docs[0][1].lower())
    real_bigram = " ".join(first_tokens[:2])
    phrases = [(0, real_bigram), (1, first_tokens[0]), (2, "zz_missing qq_missing")]
    scan = _rows(phrase_match_counts(ds, phrases))
    indexed = _rows(phrase_search_indexed(idx, ds, phrases))
    assert scan  # the bigram construction found something
    assert indexed == scan == _brute(dict(docs), phrases)


def test_phrase_positional_matches_scan_with_salting(code_corpus, tmp_path):
    """Positional (v4) index answers phrases purely from pos.bin,
    identically to the scan — including terms salted across partitions
    (aggressive salting forces multi-bucket positional postings) and
    repeated-token / overlapping phrases."""
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.phrase import phrase_search_positional
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(
        corpus_dir,
        idx,
        IndexConfig(
            num_partitions=4, salt_buckets=3, salt_df_threshold=0.05,
            store_positions=True,
        ),
    )
    docs = corpus_docs(corpus_dir)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "content": pa.array([c for _, c in docs], type=pa.string()),
            }
        )
    )
    toks = re.findall(r"[a-z0-9_]+", docs[0][1].lower())
    phrases = [
        (0, " ".join(toks[:2])),
        (1, toks[0]),
        (2, " ".join(toks[:4])),
        (3, f"{toks[0]} {toks[0]}"),  # repeated token
        (4, "zz_missing qq_missing"),
    ]
    scan = _rows(phrase_match_counts(ds, phrases))
    posi = _rows(phrase_search_positional(idx, phrases))
    assert scan and posi == scan == _brute(dict(docs), phrases)


def test_positional_index_errors_without_positions(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.phrase import phrase_search_positional

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, IndexConfig(num_partitions=4))  # v3 layout
    import pytest as _pytest

    with _pytest.raises(Exception, match="store_positions|no positions"):
        phrase_search_positional(idx, [(0, "def")]).take_all()


def test_attach_snippets_window_semantics():
    from distributed_text_search_ray.pipelines.search import attach_snippets

    pad = "x" * 100
    texts = {
        1: f"{pad} Alpha beta {pad}",   # term mid-doc: window starts 30 before
        2: "beta starts here " + pad,   # term at doc start: clamped to 0
    }
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), type=pa.int64()),
                "content": pa.array(list(texts.values()), type=pa.string()),
            }
        )
    )
    topk = pa.table(
        {
            "query_id": pa.array([0, 0], type=pa.int64()),
            "rank": pa.array([1, 2], type=pa.int64()),
            "doc_id": pa.array([1, 2], type=pa.int64()),
        }
    )
    # query terms sorted asc: ["alpha", "beta"]; doc 1 contains alpha (wins
    # over beta later in the text), doc 2 only beta
    rows = {r["doc_id"]: r for r in attach_snippets(ds, topk, [(0, "beta alpha")]).take_all()}
    t1 = texts[1]
    pos = t1.lower().find("alpha")
    assert rows[1]["snippet"] == t1[pos - 30 : pos - 30 + 80]
    assert rows[2]["snippet"] == texts[2][:80]
    assert rows[1]["rank"] == 1 and rows[2]["rank"] == 2


def test_phrase_candidates_prune(code_corpus, tmp_path):
    """The indexed path's candidate stage must bound verification work by
    the rarest term's df — a phrase containing a unique term yields exactly
    that term's df candidates, not the whole corpus."""
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.phrase import _PhraseCandidates
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, IndexConfig(num_partitions=4))
    docs = corpus_docs(corpus_dir)
    # find a token appearing in few docs
    from collections import Counter

    df = Counter()
    for _, c in docs:
        df.update(set(re.findall(r"[a-z0-9_]+", c.lower())))
    rare = min(df, key=lambda t: (df[t], t))
    common = max(df, key=lambda t: (df[t], t))
    stage = _PhraseCandidates(idx)
    out = stage(
        pa.table(
            {
                "query_id": pa.array([0], type=pa.int64()),
                "query": pa.array([f"{common} {rare}"], type=pa.string()),
            }
        )
    )
    assert out.num_rows <= df[rare] < len(docs)


def _brute_proximity(docs: dict, queries, max_span):
    """Pure-Python minimal-window oracle: for each doc, min over one
    occurrence choice per distinct term of (max pos - min pos)."""
    out = []
    for qid, q in queries:
        terms = sorted(set(re.findall(r"[a-z0-9_]+", q.lower())))
        if not terms:
            continue
        for d, content in docs.items():
            toks = re.findall(r"[a-z0-9_]+", content.lower())
            pos = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
            if any(not p for p in pos.values()):
                continue
            merged = sorted((p, t) for t in terms for p in pos[t])
            last = {}
            best = None
            for p, t in merged:
                last[t] = p
                if len(last) == len(terms):
                    span = p - min(last.values())
                    best = span if best is None else min(best, span)
            if best is not None and best <= max_span:
                out.append((qid, d, best))
    return sorted(out)


def test_proximity_search_matches_brute(code_corpus, tmp_path):
    """proximity_search over the positional index == pure-Python minimal
    window oracle, with aggressive salting; single-term queries span 0;
    missing terms match nothing."""
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.phrase import proximity_search
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(
        corpus_dir,
        idx,
        IndexConfig(
            num_partitions=4, salt_buckets=3, salt_df_threshold=0.05,
            store_positions=True,
        ),
    )
    docs = dict(corpus_docs(corpus_dir))
    toks = re.findall(r"[a-z0-9_]+", list(docs.values())[0].lower())
    queries = [
        (0, f"{toks[0]} {toks[5]}"),
        (1, f"{toks[0]} {toks[3]} {toks[7]}"),
        (2, toks[1]),                      # single term -> span 0
        (3, f"{toks[0]} zz_missing"),      # absent term -> no rows
        (4, f"{toks[2]} {toks[2]}"),       # duplicate term == single term
    ]
    got = sorted(
        (r["query_id"], r["doc_id"], r["min_span"])
        for r in proximity_search(idx, queries, max_span=12).take_all()
    )
    assert got == _brute_proximity(docs, queries, 12)
    assert any(q == 2 and s == 0 for q, _, s in got)
    assert not any(q == 3 for q, _, _ in got)


def test_proximity_sql_oracle_agrees(code_corpus, tmp_path):
    """The DuckDB window-function oracle (proximity_sql) reproduces the
    operator on the same corpus."""
    import duckdb

    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.phrase import (
        proximity_search,
        proximity_sql,
    )
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx")
    build_index(
        corpus_dir, idx, IndexConfig(num_partitions=4, store_positions=True)
    )
    docs = corpus_docs(corpus_dir)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, \"text\" VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    tok_sql = (
        "list_filter(string_split_regex(lower(\"text\"), '[^a-z0-9_]+'), x -> x <> '')"
    )
    toks = re.findall(r"[a-z0-9_]+", docs[0][1].lower())
    queries = [(0, f"{toks[0]} {toks[5]}"), (1, f"{toks[1]} {toks[4]} {toks[9]}")]
    got = sorted(
        (r["query_id"], r["doc_id"], r["min_span"])
        for r in proximity_search(idx, queries, max_span=10).take_all()
    )
    want = []
    for qid, q in queries:
        want.extend(
            tuple(r) for r in con.execute(proximity_sql(q, qid, 10, tok_sql)).fetchall()
        )
    assert got == sorted(want) and got


def test_rescore_matches_python_oracle_and_respects_window(code_corpus, tmp_path):
    """search_topk_rescored == (python BM25 window cut -> phrase-bonus
    re-rank); a doc outside the phase-1 window must never enter the top-k
    even if it contains the phrase (ES rescore window semantics)."""
    import re as _re
    from collections import Counter

    from distributed_text_search_ray.config import IndexConfig
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.search import (
        search_topk,
        search_topk_rescored,
    )
    from distributed_text_search_ray.util import round_half_away
    from tests.conftest import corpus_docs

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idxp")
    build_index(
        corpus_dir, idx, IndexConfig(num_partitions=4, store_positions=True)
    )
    docs = corpus_docs(corpus_dir)
    toks = {d: _re.findall(r"[a-z0-9_]+", c.lower()) for d, c in docs}
    df = Counter(t for l in toks.values() for t in set(l))
    common = [t for t, _ in df.most_common(3)]
    queries = [(0, f"{common[0]} {common[1]}"), (1, f"{common[2]}")]
    WINDOW, K, QW, RW = 12, 5, 1.0, 2.0

    got = search_topk_rescored(
        idx, queries, topk=K, window=WINDOW, query_weight=QW, rescore_weight=RW
    ).take_all()
    # python oracle: full BM25 ranking from the engine's own exhaustive path
    # (window+large pad), then phrase-count re-rank of the window only
    full = search_topk(idx, queries, topk=len(docs), mode="taat").take_all()
    for qid, qtext in queries:
        terms = qtext.split()
        ranked = sorted(
            ((round_half_away(r["score"], 6), r["doc_id"]) for r in full if r["query_id"] == qid),
            key=lambda t: (-t[0], t[1]),
        )
        win = ranked[:WINDOW]

        def occurrences(l, ts):
            return sum(
                1
                for i in range(len(l) - len(ts) + 1)
                if l[i : i + len(ts)] == ts
            )

        comb = sorted(
            (
                (
                    round_half_away(QW * s + RW * occurrences(toks[d], terms), 6),
                    d,
                )
                for s, d in win
            ),
            key=lambda t: (-t[0], t[1]),
        )[:K]
        mine = sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [(r["doc_id"], r["score"]) for r in mine] == [(d, s) for s, d in comb]
        # window contract: nothing from beyond rank WINDOW appears
        win_ids = {d for _, d in win}
        assert all(r["doc_id"] in win_ids for r in mine)
