"""DuckDB-differential fuzz tests for the kernels every SQL oracle leans on.

The driver's correctness gate hashes float columns produced by
``round_half_away``, match counts produced by the banded Levenshtein
window scan, and quantile rows produced by ``float_quantiles`` — these
tests fuzz each kernel directly against the DuckDB function its oracle
twin uses, over inputs far nastier than the synthetic tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_text_search_ray.util import round_half_away


# ------------------------------------------------ round_half_away vs round()

@settings(max_examples=300, deadline=None)
@given(
    st.floats(
        min_value=-1e308, max_value=1e308, allow_nan=False, allow_infinity=False
    ),
    st.integers(min_value=0, max_value=9),
)
def test_round_half_away_matches_duckdb_round(x, nd):
    con = duckdb.connect()
    (want,) = con.execute(
        "SELECT round(?::DOUBLE, ?)", [x, nd]
    ).fetchone()
    got = round_half_away(x, nd)
    assert got == want or (got == 0.0 and want == 0.0), (x, nd, got, want)
    # array path must agree with the scalar path bit-for-bit
    arr = round_half_away(np.array([x], dtype=np.float64), nd)
    assert arr[0] == got or (np.isnan(arr[0]) and np.isnan(got))


def test_round_half_away_nonfinite_passthrough():
    assert round_half_away(float("inf")) == float("inf")
    assert round_half_away(float("-inf")) == float("-inf")
    assert np.isnan(round_half_away(float("nan")))
    a = round_half_away(np.array([np.inf, -np.inf, np.nan, 1.2345675]), 6)
    assert a[0] == np.inf and a[1] == -np.inf and np.isnan(a[2])
    assert a[3] == 1.234568  # half away from zero, not banker's


# ------------------------------------------------ levenshtein vs levenshtein

@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abcxyz", max_size=24),
    st.text(alphabet="abcxyz", max_size=24),
)
def test_levenshtein_matches_duckdb(a, b):
    from distributed_text_search_ray.functions.lev import levenshtein

    con = duckdb.connect()
    (want,) = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()
    assert levenshtein(a, b) == want


# --------------------------------- windowed truncated scan vs the oracle SQL

@settings(max_examples=60, deadline=None)
@given(
    st.text(alphabet="ABC", max_size=60),
    st.text(alphabet="ABC", min_size=1, max_size=8),
    st.integers(min_value=0, max_value=3),
)
def test_windowed_match_count_matches_oracle_sql(text, pattern, k):
    """The per-window rule the apm_counts oracle encodes: at position j the
    pattern AND the text window truncate to least(len(p), len(text)-j+1)
    before the levenshtein compare."""
    from distributed_text_search_ray.functions.lev import windowed_match_count

    con = duckdb.connect()
    (want,) = con.execute(
        """
        SELECT count(*) FILTER (WHERE
            levenshtein(substring(?, 1, least(length(?), length(?) - t.j + 1)),
                        substring(?, t.j, least(length(?), length(?) - t.j + 1))) <= ?
        )::BIGINT
        FROM unnest(range(1, length(?) + 1)) AS t(j)
        """,
        [pattern, pattern, text, text, pattern, text, k, text],
    ).fetchone()
    assert windowed_match_count(text, pattern, k) == (want or 0), (text, pattern, k)


# ------------------------------------- float_quantiles vs quantile_disc fuzz

@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_float_quantiles_fuzz_matches_duckdb(ray_session, seed):
    """Seeded random columns with duplicates, +/-inf, NaN and NULL holes —
    the full null-skipping + inf-rank contract vs quantile_disc."""
    import ray.data

    from distributed_text_search_ray.pipelines.relational import float_quantiles

    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 400))
    vals = rng.choice(
        np.concatenate([rng.normal(0, 10, 8), [np.inf, -np.inf]]), size=n
    ).astype(np.float64)
    vals[rng.random(n) < 0.05] = np.nan
    col = [None if rng.random() < 0.05 else float(v) for v in vals]
    tbl = pa.table({"v": pa.array(col, type=pa.float64())})
    qs = (0.01, 0.25, 0.5, 0.75, 0.99)
    got = {
        r["q"]: r["value"]
        for r in float_quantiles(
            ray.data.from_arrow(tbl).repartition(4), "v", qs=qs, bins=16
        ).take_all()
    }
    con = duckdb.connect()
    con.register("t", tbl)
    want = {}
    for q in qs:
        (w,) = con.execute(
            # NaN-as-null is the engine's one documented divergence from
            # DuckDB (which orders NaN above +inf): mirror it in the twin
            f"SELECT quantile_disc(v, {q}) FROM t WHERE NOT isnan(v)"
        ).fetchone()
        want[q] = w
    assert got == want, (seed, got, want)


# --------------------------------------- analyzer vs string_split_regex fuzz

# every character class the analyzer cares about, plus the known-nasty code
# points: U+0130 (Turkish İ, the full-vs-simple lowercase split), dotless ı,
# ß (full lowercase is identity but casefold is not), Greek final sigma,
# combining dot above, accented latin, CJK, controls
_NASTY = "ab_0 .İIıßΣσς̇Éé日本\t\n-"


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_NASTY, max_size=40))
def test_tokenizer_matches_oracle_split(s):
    """tokens(s) must equal the oracle twin expression
    ``list_filter(string_split_regex(lower(s), '[^a-z0-9_]+'), x -> x <> '')``
    — the tokenization every index oracle (bm25_topk, term_dictionary,
    token_counts, ...) is built on."""
    from distributed_text_search_ray.functions.tokenize import Tokenizer

    con = duckdb.connect()
    (want,) = con.execute(
        "SELECT list_filter(string_split_regex(lower(?), '[^a-z0-9_]+'), x -> x <> '')",
        [s],
    ).fetchone()
    assert Tokenizer().tokens(s) == want, repr(s)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abceiosuy_", max_size=12))
def test_s_stemmer_matches_sql_case_twin(w):
    """Harman S-stemmer vs the CASE/LIKE twin used by the
    term_dictionary_stemmed oracle — same three ordered, exclusive rules."""
    from distributed_text_search_ray.functions.tokenize import Tokenizer

    con = duckdb.connect()
    (want,) = con.execute(
        """
        SELECT CASE
          WHEN ? LIKE '%eies' OR ? LIKE '%aies' THEN ?
          WHEN ? LIKE '%ies' THEN substr(?, 1, len(?) - 3) || 'y'
          WHEN ? LIKE '%aes' OR ? LIKE '%ees' OR ? LIKE '%oes' THEN ?
          WHEN ? LIKE '%es' THEN substr(?, 1, len(?) - 1)
          WHEN ? LIKE '%us' OR ? LIKE '%ss' THEN ?
          WHEN ? LIKE '%s' THEN substr(?, 1, len(?) - 1)
          ELSE ? END
        """,
        [w] * 20,
    ).fetchone()
    assert Tokenizer.s_stem(w) == want, w


# ------------------------------------ BM25 per-posting score vs the SQL twin

@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**12),  # N
    st.integers(min_value=1, max_value=10**9),  # df (clamped to N)
    st.integers(min_value=1, max_value=10**6),  # tf
    st.integers(min_value=1, max_value=10**7),  # dl
    st.floats(min_value=0.5, max_value=1e6, allow_nan=False),  # avgdl
)
def test_bm25_rounded_score_matches_duckdb_formula(N, df, tf, dl, avgdl):
    """The gate's actual contract: engine scores and the oracle's inline
    ``ln(1+(N-df+0.5)/(df+0.5)) * tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl))`` may
    differ in the last ulp (different expression trees), and every search
    oracle absorbs that by comparing ``round(score, 6)``. Pin BOTH halves:
    raw scores within 4 ulp, and the rounded values the gate hashes equal."""
    from distributed_text_search_ray.functions.bm25 import score_postings

    df = min(df, N)
    con = duckdb.connect()
    (want_raw,) = con.execute(
        "SELECT ln(1+(?::DOUBLE-?+0.5)/(?+0.5))"
        " * ?::DOUBLE*2.2/(?+1.2*(1-0.75+0.75*?::DOUBLE/?))",
        [N, df, df, tf, tf, dl, avgdl],
    ).fetchone()
    (want_rounded,) = con.execute("SELECT round(?::DOUBLE, 6)", [want_raw]).fetchone()
    got = float(score_postings(np.array([tf]), np.array([dl]), N, df, avgdl)[0])
    assert abs(got - want_raw) <= 4 * np.spacing(max(abs(got), abs(want_raw)))
    assert round_half_away(got, 6) == want_rounded, (N, df, tf, dl, avgdl)


# ------------------------------- wildcard_to_like + match_like vs DuckDB LIKE

@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab_%?*\\x1", max_size=10),
    st.lists(st.text(alphabet="ab_x1", min_size=0, max_size=8), min_size=1, max_size=8),
)
def test_wildcard_like_matches_duckdb(pattern, terms):
    """The wildcard gate's whole contract: for ANY pattern in the */?
    syntax (including literal % _ \\ that must be escaped), Arrow
    match_like over the engine's translated pattern selects exactly the
    terms DuckDB's ``LIKE ... ESCAPE '\\'`` selects."""
    import pyarrow.compute as pc

    from distributed_text_search_ray.pipelines.search import wildcard_to_like

    like = wildcard_to_like(pattern)
    arr = pa.array(terms, type=pa.string())
    mine = pc.match_like(arr, like).to_pylist()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in terms])
    want_set = {
        r[0]
        for r in con.execute(
            "SELECT s FROM t WHERE s LIKE ? ESCAPE '\\'", [like]
        ).fetchall()
    }
    got = [t for t, m in zip(terms, mine) if m]
    assert sorted(set(got)) == sorted(want_set)
