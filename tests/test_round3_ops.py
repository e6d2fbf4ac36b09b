"""Round-3 additions: TPC-H Q3/Q6 shapes, LAG-style event gaps, grouped
quantiles, distributed k-means."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from distributed_text_search_ray.pipelines import relational as R
from distributed_text_search_ray.pipelines.ann import kmeans_clusters, kmeans_fit
from distributed_text_search_ray.pipelines.textstats import (
    grouped_token_length_quantiles,
    token_length_quantiles,
)

SF = "/root/testdata/sf0.001"


def _con(*tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_tpch_q3_matches_duckdb():
    got = R.tpch_q3(SF).take_all()
    want = _con("customer", "orders", "lineitem").execute(
        """
        SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer JOIN orders ON c_custkey=o_custkey
             JOIN lineitem ON l_orderkey=o_orderkey
        WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY round(sum(l_extendedprice*(1-l_discount)), 4) DESC, l_orderkey LIMIT 10
        """
    ).fetchall()
    got_rows = sorted(
        (r["l_orderkey"], r["revenue"], r["o_orderdate"], r["o_orderpriority"]) for r in got
    )
    assert got_rows == sorted(tuple(w) for w in want)


def test_tpch_q6_matches_duckdb():
    got = R.tpch_q6(SF).take_all()
    (want,) = _con("lineitem").execute(
        """
        SELECT round(sum(l_extendedprice*l_discount),4) FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """
    ).fetchone()
    assert len(got) == 1
    assert got[0]["revenue"] == want


def test_user_event_gaps_matches_duckdb():
    got = R.user_event_gaps(SF).take_all()
    want = _con("events").execute(
        """
        WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events)
        SELECT user_id, count(gap_us)::BIGINT, round(avg(gap_us/1e6),4),
               round(max(gap_us/1e6),4)
        FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
        """
    ).fetchall()
    got_rows = sorted((r["user_id"], r["n_gaps"], r["avg_gap_s"], r["max_gap_s"]) for r in got)
    assert got_rows == sorted(tuple(w) for w in want)


def test_user_event_gaps_single_event_user_emits_no_row():
    tbl = pa.table(
        {
            "user_id": pa.array([1, 1, 2], type=pa.int64()),
            "ts": pa.array([0, 5_000_000, 9], type=pa.timestamp("us")),
            "event_id": pa.array([10, 11, 12], type=pa.int64()),
        }
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        rows = R.user_event_gaps(d).take_all()
    assert [(r["user_id"], r["n_gaps"], r["avg_gap_s"]) for r in rows] == [(1, 1, 5.0)]


def test_grouped_quantiles_consistent_with_global():
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "content": t.column("text"),
                "lang": t.column("lang"),
            }
        ),
        batch_format="pyarrow",
    )
    rows = grouped_token_length_quantiles(docs).take_all()
    langs = {r["lang"] for r in rows}
    # every lang present in the table gets all four quantiles
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
    assert langs == set(tbl.column("lang").to_pylist())
    assert len(rows) == 4 * len(langs)
    # a single-group corpus reduces to the global operator
    one = docs.filter(lambda r: r["lang"] == sorted(langs)[0])
    grouped = {
        (r["q"], r["n_tokens"]) for r in grouped_token_length_quantiles(one).take_all()
    }
    global_ = {(r["q"], r["n_tokens"]) for r in token_length_quantiles(one).take_all()}
    assert grouped == global_


def test_kmeans_clusters_matches_numpy_oracle():
    """Distributed Lloyd refinement == single-matrix numpy k-means with the
    same seeded init (embeddings are planted clusters, so assignments are
    ulp-robust)."""
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = kmeans_clusters(emb, n_clusters=6, iters=3).take_all()

    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    ids = tbl.column("vec_id").to_numpy()
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    C = kmeans_fit(X, 6, seed=42, iters=0)
    for _ in range(3):
        a = np.argmax(Xn @ C.T, axis=1)
        C = C.copy()
        for j in range(len(C)):
            m = a == j
            if m.any():
                c = Xn[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-30)
    a = np.argmax(Xn @ C.T, axis=1)
    want = dict(zip(ids.tolist(), a.tolist()))
    mine = {r["vec_id"]: r["cluster"] for r in got}
    assert mine == want
    # cosine column is the similarity to the assigned centroid, in [-1, 1]
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in got)


def test_hashed_doc_vectors_match_numpy_oracle():
    from distributed_text_search_ray.functions.hashing import md5_u64
    from distributed_text_search_ray.functions.tokenize import Tokenizer
    from distributed_text_search_ray.pipelines.textstats import hashed_doc_vectors

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"), "content": t.column("text")}),
        batch_format="pyarrow",
    )
    got = {r["vec_id"]: np.array(r["embedding"]) for r in hashed_doc_vectors(docs, dim=16).take_all()}

    tk = Tokenizer(None)
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        v = np.zeros(16)
        for t in tk.tokens(text):
            h = md5_u64(t)
            v[h % 16] += 1.0 if (h >> 63) & 1 else -1.0
        v = v / max(np.linalg.norm(v), 1e-30)
        assert np.allclose(got[doc_id], v, atol=1e-12)


def test_doc_clusters_deterministic_and_complete():
    from distributed_text_search_ray.pipelines.textstats import doc_clusters

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id"), "content": t.column("text")}),
        batch_format="pyarrow",
    )
    a = {r["doc_id"]: r["cluster"] for r in doc_clusters(docs, n_clusters=4, iters=2).take_all()}
    b = {r["doc_id"]: r["cluster"] for r in doc_clusters(docs, n_clusters=4, iters=2).take_all()}
    n_docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).num_rows
    assert len(a) == n_docs
    assert a == b  # deterministic under identical layout


def test_float_quantiles_match_duckdb():
    from distributed_text_search_ray.pipelines.relational import events_value_quantiles

    got = sorted((r["q"], r["value"]) for r in events_value_quantiles(SF).take_all())
    want = sorted(
        tuple(w)
        for w in _con("events")
        .execute(
            """
        WITH qd AS (SELECT quantile_disc("value", [0.25,0.5,0.75,0.95]) vals FROM events)
        SELECT unnest([0.25,0.5,0.75,0.95])::DOUBLE, unnest(vals)::DOUBLE FROM qd
        """
        )
        .fetchall()
    )
    assert got == want


def test_float_quantiles_duplicate_heavy_and_constant():
    """A column dominated by one repeated value still selects exactly, and a
    constant column degenerates gracefully (every quantile = the value)."""
    from distributed_text_search_ray.pipelines.relational import float_quantiles

    vals = [7.5] * 90 + [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 9.0, 10.0, 11.0]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, type=pa.float64())}))
    got = {r["q"]: r["value"] for r in float_quantiles(ds, "v", qs=(0.5, 0.95, 1.0)).take_all()}
    s = sorted(vals)
    import math

    assert got == {q: s[math.ceil(q * len(vals)) - 1] for q in (0.5, 0.95, 1.0)}

    const = ray.data.from_arrow(pa.table({"v": pa.array([3.25] * 50, type=pa.float64())}))
    got = {r["q"]: r["value"] for r in float_quantiles(const, "v", qs=(0.25, 0.9)).take_all()}
    assert got == {0.25: 3.25, 0.9: 3.25}


def test_corpus_rollup_matches_duckdb():
    from distributed_text_search_ray.pipelines.textstats import corpus_rollup

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["text", "lang", "source"]
    ).map_batches(
        lambda t: pa.table(
            {"content": t.column("text"), "lang": t.column("lang"), "source": t.column("source")}
        ),
        batch_format="pyarrow",
    )
    got = sorted(
        [
            (r["lang"], r["source"], r["n_docs"], r["total_tokens"])
            for r in corpus_rollup(docs).take_all()
        ],
        key=repr,
    )
    import __ray_entry__ as E

    tok_sql = E.TOK_SQL.format(col="text")
    want = sorted(
        (tuple(w) for w in _con("documents").execute(
            f"""
            WITH tok AS (SELECT doc_id, t.term FROM documents, unnest({tok_sql}) AS t(term)),
            agg AS (SELECT doc_id, count(*) n FROM tok GROUP BY 1),
            d AS (SELECT d.lang, d.source, coalesce(a.n,0)::BIGINT n
                  FROM documents d LEFT JOIN agg a USING (doc_id))
            SELECT lang, source, count(*)::BIGINT, sum(n)::BIGINT
            FROM d GROUP BY ROLLUP (lang, source)
            """
        ).fetchall()), key=repr)
    assert got == want


def test_unicode_corpus_token_parity_with_duckdb():
    """The analyzer ([a-z0-9_]+ over lower()) and its SQL twin must agree on
    non-ASCII content: accents/CJK/emoji act as separators, ASCII islands
    tokenize normally, and Python str.lower() quirks (e.g. dotted capital I)
    cannot diverge because non-ASCII never enters a token."""
    import os
    import tempfile

    import duckdb

    from distributed_text_search_ray.pipelines.textstats import token_counts

    texts = [
        "naïve café code_x1",          # accented latin splits the token
        "日本語テキスト abc123 мир",        # CJK + cyrillic separators
        "emoji 🎉 party_2 🎉🎉 end",
        "İstanbul STRASSE straße",     # upper/lowercase edge cases
        "",                            # empty doc
        "____",                        # underscore-only token
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "documents.parquet")
        pq.write_table(tbl, p)
        docs = ray.data.read_parquet(p).map_batches(
            lambda t: pa.table({"doc_id": t.column("doc_id"), "content": t.column("text")}),
            batch_format="pyarrow",
        )
        got = {r["doc_id"]: r["n_tokens"] for r in token_counts(docs).take_all()}
        import __ray_entry__ as E

        con = duckdb.connect()
        want = dict(
            con.execute(
                f"SELECT doc_id, len({E.TOK_SQL.format(col='text')})::BIGINT "
                f"FROM read_parquet('{p}')"
            ).fetchall()
        )
    assert got == want


def test_user_moving_avg_matches_duckdb():
    got = sorted(
        (r["event_id"], r["user_id"], r["mov_avg"])
        for r in R.user_value_moving_avg(SF).take_all()
    )
    want = sorted(
        tuple(w)
        for w in _con("events")
        .execute(
            """
        SELECT event_id, user_id,
               round(avg("value") OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        FROM events
        """
        )
        .fetchall()
    )
    assert got == want


def test_required_regex_literal_soundness():
    """Every literal the extractor claims REQUIRED must appear (lowercased)
    in every match of the pattern — fuzz over random haystacks; and the
    quantifier-digit trap must not leak ({2} is not a literal)."""
    import random
    import re
    import string

    from distributed_text_search_ray.pipelines.textstats import _required_regex_literal

    assert _required_regex_literal("a{2}b") == "b"
    assert _required_regex_literal("[0-9]{2}x") == "x"
    assert _required_regex_literal("cust[a-z]*") == "cust"
    assert _required_regex_literal("(?:spark|vector) ") is None
    assert _required_regex_literal("[0-9]+") is None
    assert _required_regex_literal("a{2") is None  # malformed -> refuse
    # multi-char escapes: their tails are NOT literals (\x61bc matches 'abc')
    assert _required_regex_literal(r"\x61bc") is None
    assert _required_regex_literal(r"\101bc") is None
    assert _required_regex_literal(r"\N{LATIN SMALL LETTER A}x") is None
    assert _required_regex_literal(r"\d+abc") == "abc"

    pats = ["a{2}b", "x{2,3}yz", "cust[a-z]*", "foo?bar", "ab\\d+cd", "a[bc]d", "val_\\d+"]
    rng = random.Random(0)
    alphabet = string.ascii_lowercase + "0123456789_ {}"
    for pat in pats:
        lit = _required_regex_literal(pat)
        assert lit is not None
        rx = re.compile(pat)
        for _ in range(1500):
            s = "".join(rng.choices(alphabet, k=30))
            for m in rx.finditer(s):
                assert lit in m.group(0).lower()


def test_regex_indexed_equals_scan(built_index_r3):
    corpus_dir, index_dir = built_index_r3
    from distributed_text_search_ray.pipelines.textstats import (
        regex_match_counts,
        regex_match_counts_indexed,
    )
    from distributed_text_search_ray.sources.corpus import read_corpus

    pats = [
        (0, "def [a-z_]+"),       # literal "def" -> indexed path
        (1, "[0-9]+"),            # no literal -> scan fallback
        (2, "token"),             # pure literal
        (3, "zzz_none[0-9]?"),    # literal matching nothing
    ]
    docs = read_corpus(corpus_dir, columns=["doc_id", "content"])
    a = sorted(
        (r["query_id"], r["doc_id"], r["n_matches"])
        for r in regex_match_counts(docs, pats).take_all()
    )
    b = sorted(
        (r["query_id"], r["doc_id"], r["n_matches"])
        for r in regex_match_counts_indexed(index_dir, docs, pats).take_all()
    )
    assert a == b and len(a) > 0


def test_regex_indexed_hot_literal_routes_to_scan(built_index_r3):
    """A stopword-ish literal (df bound > half the corpus) must route to the
    scan plan rather than pulling an O(N) candidate set — and still produce
    scan-identical results."""
    corpus_dir, index_dir = built_index_r3
    from distributed_text_search_ray.pipelines.textstats import (
        regex_match_counts,
        regex_match_counts_indexed,
    )
    from distributed_text_search_ray.sources.corpus import read_corpus

    pats = [(0, "def?")]  # literal "de": hot prefix present in ~all docs
    docs = read_corpus(corpus_dir, columns=["doc_id", "content"])
    a = sorted(
        (r["query_id"], r["doc_id"], r["n_matches"])
        for r in regex_match_counts(docs, pats).take_all()
    )
    b = sorted(
        (r["query_id"], r["doc_id"], r["n_matches"])
        for r in regex_match_counts_indexed(index_dir, docs, pats).take_all()
    )
    assert a == b and len(a) > 0


def test_required_regex_literal_soundness_hypothesis():
    """Property: for ANY pattern built from a realistic grammar, if the
    extractor claims a required literal, every match on any haystack
    contains it (lowercased)."""
    import re

    from hypothesis import given, settings, strategies as st

    atom = st.one_of(
        st.text(alphabet="abc01_", min_size=1, max_size=4),  # literal run
        st.sampled_from(["[a-z]", "[0-9]", "\\d", "\\w", ".", "[bc]"]),
    )
    quant = st.sampled_from(["", "?", "*", "+", "{2}", "{1,3}"])
    piece = st.tuples(atom, quant).map(lambda t: t[0] + t[1])
    pattern = st.lists(piece, min_size=1, max_size=5).map("".join)
    haystack = st.text(alphabet="abc01_ xy.", min_size=0, max_size=40)

    from distributed_text_search_ray.pipelines.textstats import _required_regex_literal

    @settings(max_examples=300, deadline=None)
    @given(pattern, haystack)
    def check(pat, s):
        # quantifiers can attach to a multi-char literal's LAST char only —
        # that is exactly what the extractor models; skip invalid patterns
        try:
            rx = re.compile(pat)
        except re.error:
            return
        lit = _required_regex_literal(pat)
        if lit is None:
            return
        for m in rx.finditer(s):
            assert lit in m.group(0).lower(), (pat, lit, m.group(0))

    check()


def test_grouped_float_quantiles_match_duckdb():
    from distributed_text_search_ray.pipelines.relational import grouped_float_quantiles

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    got = sorted(
        (r["event_type"], r["q"], r["value"])
        for r in grouped_float_quantiles(ds, "event_type", "value").take_all()
    )
    want = sorted(
        tuple(w)
        for w in _con("events")
        .execute(
            """
        WITH qd AS (SELECT event_type, quantile_disc("value", [0.25,0.5,0.75,0.95]) vals
                    FROM events GROUP BY 1)
        SELECT event_type, unnest([0.25,0.5,0.75,0.95])::DOUBLE, unnest(vals)::DOUBLE FROM qd
        """
        )
        .fetchall()
    )
    assert got == want


def test_ann_hard_negatives_excludes_same_label():
    from distributed_text_search_ray.pipelines.ann import ann_hard_negatives

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    labels = dict(zip(ids.tolist(), tbl.column("label").to_pylist()))
    q = [(int(ids[0]), labels[int(ids[0])], tbl.column("embedding")[0].as_py())]
    rows = ann_hard_negatives(emb, q, k=5).take_all()
    assert len(rows) == 5
    # no result shares the query's label, none is the query itself
    for r in rows:
        assert labels[r["vec_id"]] != q[0][1]
        assert r["vec_id"] != q[0][0]
    # numpy oracle: exact top-5 among different-label vectors
    X = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    qv = np.array(q[0][2], dtype=np.float64)
    qv = qv / np.linalg.norm(qv)
    sims = np.round(Xn @ qv, 6)
    mask = np.array([labels[int(i)] != q[0][1] and int(i) != q[0][0] for i in ids])
    order = np.lexsort((ids[mask], -sims[mask]))[:5]
    want = [(int(ids[mask][i]), float(sims[mask][i])) for i in order]
    got = [(r["vec_id"], r["cosine"]) for r in sorted(rows, key=lambda r: r["rank"])]
    assert got == want


def test_s_stemmer_rules():
    from distributed_text_search_ray.functions.tokenize import Tokenizer

    st = Tokenizer.s_stem
    assert st("queries") == "query"
    assert st("churches") == "churche"  # S-stemmer is rule-based, not perfect
    assert st("tables") == "table"
    assert st("files") == "file"
    assert st("class") == "class"      # -ss protected
    assert st("corpus") == "corpus"    # -us protected
    assert st("goes") == "goes"        # -oes protected
    assert st("y") == "y"


def test_stemmed_analyzer_end_to_end(tmp_path):
    """An index built with the stem='s' analyzer conflates plural and
    singular: searching 'query' finds docs containing only 'queries', and
    the analyzer rides the manifest so the query side stems identically."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.config import AnalyzerConfig
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.search import search_topk

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * 3,
                "path": ["a.py", "b.py", "c.py"],
                "commit": ["c"] * 3,
                "lang": ["py"] * 3,
                "content": [
                    "queries run against tables",
                    "one query one table",
                    "nothing relevant here",
                ],
            }
        ),
        str(corpus / "shard_00000.parquet"),
    )
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_partitions=2, analyzer=AnalyzerConfig(stem="s"))
    build_index(str(corpus), idx, cfg)
    rows = search_topk(idx, [(0, "query"), (1, "tables")], topk=5).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    # both plural and singular docs match either query form
    assert len(by_q[0]) == 2 and by_q[0] == by_q[1]


def test_delete_docs_tombstones_all_query_paths(tmp_path, code_corpus):
    """Lucene-style tombstones: after delete_docs, the deleted doc vanishes
    from BM25, boolean, and fuzzy results without a rebuild; stats stay at
    build-time values (scores of surviving docs unchanged)."""
    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.boolquery import boolean_search
    from distributed_text_search_ray.pipelines.build import build_index, delete_docs
    from distributed_text_search_ray.pipelines.search import fuzzy_term_search, search_topk

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "idx_del")
    build_index(corpus_dir, idx, IndexConfig(num_partitions=4))

    before = search_topk(idx, [(0, "def tokenize")], topk=5).take_all()
    assert before
    victim = before[0]["doc_id"]
    fz_before = fuzzy_term_search(idx, [(0, "def", 0)]).take_all()[0]

    delete_docs(idx, [victim])

    after = search_topk(idx, [(0, "def tokenize")], topk=5).take_all()
    assert victim not in {r["doc_id"] for r in after}
    # surviving docs keep their exact build-time scores (stale-stats contract)
    before_scores = {r["doc_id"]: r["score"] for r in before}
    for r in after:
        if r["doc_id"] in before_scores:
            assert r["score"] == before_scores[r["doc_id"]]
    bool_after = boolean_search(idx, [(0, "def")]).take_all()
    assert victim not in {r["doc_id"] for r in bool_after}
    fz_after = fuzzy_term_search(idx, [(0, "def", 0)]).take_all()[0]
    assert fz_after["n_docs"] == fz_before["n_docs"] - 1

    # idempotent + cumulative
    rep = delete_docs(idx, [victim])
    assert rep["n_deleted"] == 1


def test_merge_carries_tombstones(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.build import build_index, delete_docs
    from distributed_text_search_ray.pipelines.merge import merge_indexes
    from distributed_text_search_ray.pipelines.search import search_topk

    def corpus(d, texts, tag):
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "repo": [tag] * len(texts),
                    "path": [f"{i}.py" for i in range(len(texts))],
                    "commit": ["c"] * len(texts),
                    "lang": ["py"] * len(texts),
                    "content": texts,
                }
            ),
            str(d / "shard_00000.parquet"),
        )
        return str(d)

    cfg = IndexConfig(num_partitions=2)
    ca = corpus(tmp_path / "ca", ["alpha beta", "alpha gamma"], "a")
    cb = corpus(tmp_path / "cb", ["alpha delta", "epsilon"], "b")
    ia, ib = str(tmp_path / "ia"), str(tmp_path / "ib")
    build_index(ca, ia, cfg)
    build_index(cb, ib, cfg)
    hit = search_topk(ia, [(0, "beta")], topk=1).take_all()
    delete_docs(ia, [hit[0]["doc_id"]])
    out = str(tmp_path / "merged")
    merge_indexes([ia, ib], out)
    merged_hits = {r["doc_id"] for r in search_topk(out, [(0, "alpha")], topk=10).take_all()}
    assert hit[0]["doc_id"] not in merged_hits
    assert len(merged_hits) == 2  # the two surviving alpha docs


def test_delete_docs_positional_phrase_path(tmp_path):
    """term_positions (the v4 positional stream) must honor tombstones too —
    it filters postings AND their per-posting position groups."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.build import build_index, delete_docs
    from distributed_text_search_ray.pipelines.phrase import phrase_search_positional

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * 3,
                "path": ["a.py", "b.py", "c.py"],
                "commit": ["c"] * 3,
                "lang": ["py"] * 3,
                "content": ["alpha beta gamma", "alpha beta delta", "beta alpha"],
            }
        ),
        str(d / "shard_00000.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(d), idx, IndexConfig(num_partitions=2, store_positions=True))
    before = phrase_search_positional(idx, [(0, "alpha beta")]).take_all()
    assert len(before) == 2
    victim = sorted(r["doc_id"] for r in before)[0]
    delete_docs(idx, [victim])
    after = phrase_search_positional(idx, [(0, "alpha beta")]).take_all()
    assert {r["doc_id"] for r in after} == {r["doc_id"] for r in before} - {victim}


def test_float_quantiles_skew_refinement_resolves_repeated_value():
    """An over-cap bucket made of ONE repeated value resolves via the
    (min,max) refinement pass instead of raising (and without collecting
    the bucket)."""
    from distributed_text_search_ray.pipelines.relational import (
        float_quantiles,
        grouped_float_quantiles,
    )

    vals = [0.0] * 500 + [float(i) for i in range(1, 101)]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, type=pa.float64())}))
    got = {r["q"]: r["value"] for r in
           float_quantiles(ds, "v", qs=(0.5, 0.99), max_candidate_rows=50).take_all()}
    import math

    s = sorted(vals)
    assert got == {q: s[math.ceil(q * len(vals)) - 1] for q in (0.5, 0.99)}

    tbl = pa.table(
        {
            "g": pa.array(["a"] * 600 + ["b"] * 10, type=pa.string()),
            "v": pa.array(vals + [float(i) for i in range(10)], type=pa.float64()),
        }
    )
    gds = ray.data.from_arrow(tbl)
    rows = grouped_float_quantiles(gds, "g", "v", qs=(0.5,), max_candidate_rows=50).take_all()
    by_g = {r["g"]: r["value"] for r in rows}
    assert by_g["a"] == 0.0 and by_g["b"] == sorted(range(10))[math.ceil(0.5 * 10) - 1]


def test_stopword_analyzer_end_to_end(tmp_path):
    """An index built with stopwords drops them from postings, doc lengths,
    and queries alike (a pure-stopword query matches nothing)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.config import AnalyzerConfig
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.search import search_topk

    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "repo": ["r"] * 2,
                "path": ["a.py", "b.py"],
                "commit": ["c"] * 2,
                "lang": ["py"] * 2,
                "content": ["the quick value of the table", "the the the other"],
            }
        ),
        str(d / "shard_00000.parquet"),
    )
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(num_partitions=2, analyzer=AnalyzerConfig(stopwords=("the", "of")))
    rep = build_index(str(d), idx, cfg)
    # doc lengths exclude stopwords: (quick value table) + (other) = 3 + 1
    assert rep["total_tokens"] == 4
    assert search_topk(idx, [(0, "the of")], topk=5).take_all() == []
    hits = search_topk(idx, [(0, "the value")], topk=5).take_all()
    assert len(hits) == 1  # only the doc with 'value'; 'the' contributes nothing


def test_hybrid_search_matches_composed_oracle(built_index_r3):
    """RRF fusion == pure-Python composition of the oracle BM25 ranking and
    a numpy cosine ranking over the same hashed vectors."""
    import math

    from distributed_text_search_ray.functions.hashing import md5_u64
    from distributed_text_search_ray.functions.tokenize import Tokenizer
    from distributed_text_search_ray.oracle import bm25_scores, build_oracle_index, topk
    from distributed_text_search_ray.pipelines.search import hybrid_search_topk
    from distributed_text_search_ray.sources.corpus import read_corpus
    from distributed_text_search_ray.util import round_half_away
    from tests.conftest import corpus_docs

    corpus_dir, index_dir = built_index_r3
    docs = corpus_docs(corpus_dir)
    queries = [(0, "def tokenize"), (1, "merge import data")]
    K, M, DIM, RRF = 5, 20, 16, 60

    got = hybrid_search_topk(
        index_dir,
        read_corpus(corpus_dir, columns=["doc_id", "content"]),
        queries,
        k=K,
        fetch_k=M,
        dim=DIM,
        rrf_k=RRF,
    ).take_all()

    idx = build_oracle_index(docs)
    tk = Tokenizer(None)

    def hvec(text):
        v = np.zeros(DIM)
        for t in tk.tokens(text):
            h = md5_u64(t)
            v[h % DIM] += 1.0 if (h >> 63) & 1 else -1.0
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    dvecs = {d: hvec(t) for d, t in docs}
    expected = []
    for qid, qtext in queries:
        rrf: dict[int, float] = {}
        # mirror the engine's determinism contract: sparse side ranks by
        # the 6-dp-rounded BM25 score desc, doc_id asc
        rounded = {
            d: float(round_half_away(np.float64(s), 6))
            for d, s in bm25_scores(idx, tk.tokens(qtext)).items()
        }
        for rank, doc, _s in topk(rounded, M):
            rrf[doc] = rrf.get(doc, 0.0) + 1.0 / (RRF + rank)
        qv = hvec(qtext)
        # mirror ann_brute_topk exactly: round_half_away(raw cosine, 6)
        sims = {d: float(round_half_away(np.float64(v @ qv), 6)) for d, v in dvecs.items()}
        ranked = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:M]
        for rank, (doc, _c) in enumerate(ranked, start=1):
            rrf[doc] = rrf.get(doc, 0.0) + 1.0 / (RRF + rank)
        fused = sorted(
            ((d, float(round_half_away(np.float64(s), 6))) for d, s in rrf.items()),
            key=lambda t: (-t[1], t[0]),
        )[:K]
        for rank, (doc, s) in enumerate(fused, start=1):
            expected.append((qid, rank, doc, s))

    got_rows = sorted((r["query_id"], r["rank"], r["doc_id"], r["rrf"]) for r in got)
    assert got_rows == sorted(expected)


def test_explain_score_decomposition(built_index_r3):
    """explain()'s per-term contributions sum to exactly the ranked score."""
    from distributed_text_search_ray.pipelines.search import explain_score, search_topk

    _, index_dir = built_index_r3
    rows = search_topk(index_dir, [(0, "def tokenize zzz_missing")], topk=3).take_all()
    assert rows
    for r in rows:
        exp = explain_score(index_dir, "def tokenize zzz_missing", r["doc_id"])
        assert exp["score"] == r["score"]  # bit-exact: same accumulation order
        assert sum(t["contribution"] for t in exp["terms"]) == exp["score"]
        missing = [t for t in exp["terms"] if t["term"] == "zzz_missing"][0]
        assert missing == {
            "term": "zzz_missing", "tf": 0, "df": 0, "idf": 0.0,
            "tf_part": 0.0, "contribution": 0.0,
        }
