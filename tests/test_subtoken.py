"""Code-subtoken analyzer (AnalyzerConfig.split_identifiers).

The input_hint's corpus is source code; a code-search engine must match
`parseConfig` / `parse_config` when the user searches `parse config` (and
vice versa). The mode is defined so it stays oracle-checkable: camel-boundary
'_' injection before lower(), then tokens are runs of [a-z0-9] — exactly
expressible in DuckDB as
string_split_regex(lower(regexp_replace(col,'([a-z0-9])([A-Z])','\\1_\\2','g')),
'[^a-z0-9]+'). Parity with that expression is pinned here (explicit cases +
hypothesis fuzz), plus an end-to-end index/search differential against a
hand-rolled BM25 over DuckDB-tokenized docs (fully independent of the
engine's Tokenizer).
"""

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_text_search_ray.config import AnalyzerConfig, IndexConfig
from distributed_text_search_ray.functions.tokenize import Tokenizer

SUBTOK_SQL = (
    "list_filter(string_split_regex(lower(regexp_replace(?, "
    "'([a-z0-9])([A-Z])', '\\1_\\2', 'g')), '[^a-z0-9]+'), x -> x <> '')"
)


def duck_tokens(con, text: str) -> list[str]:
    return con.execute("SELECT " + SUBTOK_SQL, [text]).fetchone()[0]


EXPLICIT = [
    "parseHTTPConfig snake_case getValue2X",
    "XMLHttpRequest fooBarBaz a_b__c",
    "ABCdef x9Y UPPER lower MixedCase2More",
    "def getFoo(self): return self._barBaz2  # fooBAR",
    "",
    "___",
    "İstanbul naïveCamelCase",  # U+0130 simple-lowercase fixup still applies
    "a1B2c3D4",
]


def test_tokenizer_matches_duckdb_expression():
    tk = Tokenizer(AnalyzerConfig(split_identifiers=True))
    con = duckdb.connect()
    for text in EXPLICIT:
        assert tk.tokens(text) == duck_tokens(con, text), text


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            list("abcXYZ019_ -.\nİıßΣσ") + ["\U0001F600"]
        ),
        max_size=40,
    )
)
def test_tokenizer_fuzz_parity(text):
    tk = Tokenizer(AnalyzerConfig(split_identifiers=True))
    con = duckdb.connect()
    assert tk.tokens(text) == duck_tokens(con, text)


def test_fingerprint_and_default_behavior():
    # behavior-neutral default keeps pre-existing index manifests valid
    assert (
        AnalyzerConfig().fingerprint()
        == AnalyzerConfig(split_identifiers=False).fingerprint()
    )
    assert (
        AnalyzerConfig(split_identifiers=True).fingerprint()
        != AnalyzerConfig().fingerprint()
    )
    # default analyzer unchanged: identifiers stay whole
    assert Tokenizer(AnalyzerConfig()).tokens("snake_case getValue") == [
        "snake_case",
        "getvalue",
    ]


# ---------------------------------------------------------------- end-to-end

DOCS = [
    (0, "def parseConfig(self): return load_yaml(configPath)"),
    (1, "class HTTPServer: def handle_request(self, req): pass"),
    (2, "parse config reload  # plain words, no identifiers"),
    (3, "x = getValue2X() + parse_config_path"),
    (4, "unrelated tokens only zebra quux"),
]
QUERIES = [
    (0, "parseConfig"),          # camel query -> [parse, config]
    (1, "handle_request http"),  # snake + plain
    (2, "config path"),          # plain words hit camel/snake docs
    (3, "zzzMissing"),
    # camel form that appears in NO doc verbatim — doc 0 has load_yaml, so
    # only identifier splitting can connect them (the negative control below)
    (4, "loadYaml"),
]
K1, B = 1.2, 0.75


def _bm25_expected(con, topk=5):
    """Hand-rolled BM25 over DuckDB-tokenized docs: independent of the
    engine's Tokenizer, same formula/rounding contract as the driver gate."""
    toks = {d: duck_tokens(con, t) for d, t in DOCS}
    n = len(DOCS)
    dl = {d: len(ts) for d, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = []
    for qid, q in QUERIES:
        scores = {}
        for term in dict.fromkeys(duck_tokens(con, q)):
            if term not in df:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            for d, ts in toks.items():
                tf = ts.count(term)
                if tf:
                    scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1) / (
                        tf + K1 * (1 - B + B * dl[d] / avgdl)
                    )
        ranked = sorted(
            ((round(s, 6), d) for d, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )[:topk]
        out.extend(
            (qid, r + 1, d, s) for r, (s, d) in enumerate(ranked)
        )
    return sorted(out)


@pytest.fixture(scope="module")
def camel_index(tmp_path_factory):
    from distributed_text_search_ray.pipelines.build import build_index

    root = tmp_path_factory.mktemp("subtok")
    corpus = str(root / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
                "content": pa.array([t for _, t in DOCS], type=pa.string()),
            }
        ),
        os.path.join(corpus, "shard-0.parquet"),
    )
    idx = str(root / "idx")
    build_index(
        corpus,
        idx,
        IndexConfig(
            num_partitions=4, analyzer=AnalyzerConfig(split_identifiers=True)
        ),
    )
    return idx


def test_subtoken_search_matches_independent_bm25(camel_index):
    from distributed_text_search_ray.pipelines.search import search_topk

    con = duckdb.connect()
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 6))
        for r in search_topk(camel_index, QUERIES, topk=5).take_all()
    )
    assert got == _bm25_expected(con)


def test_nonsplitting_index_misses_camel_queries(camel_index, tmp_path_factory):
    """Negative control: the same camel query against a DEFAULT-analyzer
    index finds nothing — the subtoken hits above really come from
    split_identifiers, not from incidental token overlap."""
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.search import search_topk

    root = tmp_path_factory.mktemp("plain")
    corpus = str(root / "corpus")
    os.makedirs(corpus)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], type=pa.int64()),
                "content": pa.array([t for _, t in DOCS], type=pa.string()),
            }
        ),
        os.path.join(corpus, "shard-0.parquet"),
    )
    idx = str(root / "idx")
    build_index(corpus, idx, IndexConfig(num_partitions=4))
    rows = search_topk(idx, [(0, "loadYaml")], topk=5).take_all()
    assert rows == []
