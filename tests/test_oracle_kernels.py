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
