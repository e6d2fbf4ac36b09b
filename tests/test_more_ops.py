"""Tests: joins, session windows, multimodal stubs, reference-format source."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from distributed_text_search_ray.pipelines.joins import (
    broadcast_lookup,
    hash_join,
    revenue_by_nation,
)
from distributed_text_search_ray.pipelines.multimodal import (
    MediaDecoder,
    decode_and_featurize,
    frame_sample_stub,
    synthetic_media,
)
from distributed_text_search_ray.pipelines.relational import sessionize
from distributed_text_search_ray.sources.corpus import read_text_dir

SF = "/root/testdata/sf0.001"


def test_broadcast_lookup():
    import pandas as pd

    big = ray.data.from_items([{"k": i % 3, "v": i} for i in range(100)])
    small = pd.DataFrame({"k": [0, 1], "name": ["zero", "one"]})
    out = broadcast_lookup(big, small, on="k").take_all()
    assert len(out) == 67  # k==2 rows dropped (34 of them)
    assert all(r["name"] in ("zero", "one") for r in out)


def test_hash_join_matches_duckdb():
    left = ray.data.from_items([{"id": i, "a": i * 2} for i in range(50)])
    right = ray.data.from_items([{"id": i, "b": i * 3} for i in range(25, 75)])
    out = hash_join(left, right, on="id", num_partitions=4).take_all()
    rows = sorted((r["id"], r["a"], r["b"]) for r in out)
    assert rows == [(i, i * 2, i * 3) for i in range(25, 50)]


def test_revenue_by_nation_matches_duckdb():
    got = revenue_by_nation(SF).take_all()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    want = con.execute(
        """
        SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) revenue,
               count(*)::BIGINT n_rows
        FROM lineitem JOIN orders ON l_orderkey=o_orderkey
             JOIN customer ON o_custkey=c_custkey
             JOIN nation ON c_nationkey=n_nationkey
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    got_rows = sorted((r["n_name"], r["revenue"], r["n_rows"]) for r in got)
    assert got_rows == [tuple(w) for w in want]


def test_sessionize_matches_duckdb():
    got = sessionize(SF, gap_minutes=30).take_all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.execute(
        """
        WITH e AS (SELECT user_id, epoch_us(ts) tus, value FROM events),
        o AS (SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus) prev FROM e),
        s AS (SELECT *, sum(CASE WHEN prev IS NULL OR tus - prev > 1800000000
                           THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY tus
                       ROWS UNBOUNDED PRECEDING) sid FROM o)
        SELECT user_id, (min(tus) // 1000000)::BIGINT session_start,
               count(*)::BIGINT n_events, round(sum(value), 4) sum_value
        FROM s GROUP BY user_id, sid ORDER BY 1, 2
        """
    ).fetchall()
    got_rows = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"]) for r in got
    )
    assert got_rows == [tuple(w) for w in want]


def test_asof_join_matches_duckdb():
    from distributed_text_search_ray.pipelines.relational import asof_join_latest

    SF = "/root/testdata/sf0.001"
    got = asof_join_latest(SF, "purchase", "click").take_all()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    want = con.sql("""
      WITH l AS (SELECT event_id, user_id, epoch_us(ts) tus, value FROM events
                 WHERE event_type = 'purchase'),
      r0 AS (SELECT event_id, user_id, epoch_us(ts) tus, value FROM events
             WHERE event_type = 'click'),
      r AS (SELECT * FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id, tus
                                           ORDER BY event_id DESC) rn
              FROM r0) WHERE rn = 1)
      SELECT l.user_id, l.event_id l_event_id, l.tus::BIGINT l_ts,
             round(l.value, 4) l_value, r.event_id r_event_id,
             r.tus::BIGINT r_ts, round(r.value, 4) r_value
      FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
    """).fetchall()
    key = lambda r: (r[0], r[1])
    got_rows = sorted(
        (r["user_id"], r["l_event_id"], r["l_ts"], r["l_value"],
         r["r_event_id"], r["r_ts"], r["r_value"])
        for r in got
    )
    assert got_rows == sorted(map(tuple, want))
    assert len(got_rows) > 0


def test_media_decode_stub_raises_without_fake():
    # ppm/wav decode for real; only codec-less formats (video) stub
    dec = MediaDecoder(fake=False)
    batch = synthetic_media(3)  # rows: image(ppm), audio(wav), video(mp4)
    assert dec(batch.slice(0, 2)).num_rows == 2  # real decoders
    with pytest.raises(NotImplementedError):
        dec(batch.slice(2, 1))


def test_ppm_codec_roundtrip_and_thumbnail():
    from distributed_text_search_ray.pipelines.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # flat gray image -> flat thumbnail with the exact gray level
    gray = np.full((32, 32, 3), 77, dtype=np.uint8)
    dec = MediaDecoder()
    thumb = dec._decode_one("ppm", encode_ppm(gray))
    assert thumb.shape == (8, 8)
    assert np.all(np.abs(thumb.astype(int) - 77) <= 1)


def test_media_codecs_fuzz_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from distributed_text_search_ray.pipelines.multimodal import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
    )

    @settings(max_examples=30, deadline=None)
    @given(
        arrays(
            np.uint8,
            st.tuples(st.integers(1, 12), st.integers(1, 12), st.just(3)),
        )
    )
    def ppm_roundtrip(px):
        assert np.array_equal(decode_ppm(encode_ppm(px)), px)

    @settings(max_examples=30, deadline=None)
    @given(arrays(np.int16, st.integers(0, 500)))
    def wav_roundtrip(samples):
        back, sr = decode_wav(encode_wav(samples, 8000))
        assert sr == 8000
        assert np.array_equal(back, samples)

    ppm_roundtrip()
    wav_roundtrip()


def test_wav_codec_roundtrip_and_envelope():
    from distributed_text_search_ray.pipelines.multimodal import (
        decode_wav,
        encode_wav,
    )

    t = np.arange(8000)
    samples = (3000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    back, sr = decode_wav(encode_wav(samples, 8000))
    assert sr == 8000
    assert np.array_equal(back, samples)
    dec = MediaDecoder()
    env = dec._decode_one("wav", encode_wav(samples, 8000))
    assert env.shape == (8, 8)
    # constant-amplitude sine -> roughly uniform nonzero envelope
    assert env.min() > 0
    silent = dec._decode_one("wav", encode_wav(np.zeros(100, dtype=np.int16), 8000))
    assert silent.sum() == 0


def test_media_pipeline_deterministic():
    media = ray.data.from_arrow(synthetic_media(30, seed=4))
    out1 = sorted(
        (r["media_id"], tuple(r["embedding"]))
        for r in decode_and_featurize(media, fake=True).take_all()
    )
    media2 = ray.data.from_arrow(synthetic_media(30, seed=4))
    out2 = sorted(
        (r["media_id"], tuple(r["embedding"]))
        for r in decode_and_featurize(media2, fake=True).take_all()
    )
    assert out1 == out2
    assert len(out1) == 30
    assert all(len(e) == 64 for _, e in out1)


def test_frame_sample():
    media = ray.data.from_arrow(synthetic_media(30, seed=1))
    frames = frame_sample_stub(media, every_ms=1000).take_all()
    vids = {r["media_id"] for r in frames}
    meta = {r["media_id"]: r for r in synthetic_media(30, seed=1).to_pylist()}
    for mid in vids:
        assert meta[mid]["modality"] == "video"
        n = len([f for f in frames if f["media_id"] == mid])
        assert n == len(range(0, meta[mid]["duration_ms"], 1000))


def test_read_text_dir_reference_fixture(tmp_path):
    # reference-style corpus: dir of <rank>.txt files (src/flexible_mpi.c:232)
    d = tmp_path / "dna"
    d.mkdir()
    (d / "0.txt").write_text("ACGTACGT")
    (d / "1.txt").write_text("TTTT\n")
    ds = read_text_dir(str(d))
    rows = sorted((r["path"], r["content"]) for r in ds.take_all())
    assert rows == [("0.txt", "ACGTACGT"), ("1.txt", "TTTT\n")]
    # and it indexes + searches end-to-end
    import pyarrow.parquet as pq

    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.apm import windowed_match_counts

    got = windowed_match_counts(ds, [(0, "ACGT", 0), (1, "TTTT", 1)]).take_all()
    counts = {r["query_id"]: r["n_matches"] for r in got}
    assert counts[0] == 2  # "ACGT" at j=0 and j=4; truncated tails don't match
    from distributed_text_search_ray.oracle import oracle_windowed_counts

    docs = [(r["doc_id"], r["content"]) for r in ds.take_all()]
    want = dict(oracle_windowed_counts(docs, [(0, "ACGT", 0), (1, "TTTT", 1)]))
    assert counts == want


def test_read_corpus_column_prune_without_doc_id(code_corpus):
    """Pruned reads on a corpus WITHOUT a doc_id column must request the
    (repo, path) sources instead of the absent derived column (regression:
    a set-op precedence bug kept doc_id in the requested column list)."""
    from distributed_text_search_ray.sources.corpus import read_corpus

    corpus_dir, _ = code_corpus
    rows = read_corpus(corpus_dir, columns=["doc_id", "content"]).take_all()
    assert rows and all("doc_id" in r and r["content"] for r in rows)


def test_fetch_docs_roundtrip(code_corpus):
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.pipelines.search import fetch_docs, search_topk
    import tempfile

    corpus_dir, _ = code_corpus
    with tempfile.TemporaryDirectory() as td:
        from distributed_text_search_ray import IndexConfig

        build_index(corpus_dir, f"{td}/idx", IndexConfig(num_partitions=4))
        hits = search_topk(f"{td}/idx", [(0, "def data")], topk=5).take_all()
        ids = [r["doc_id"] for r in hits]
        docs = fetch_docs(corpus_dir, ids, columns=["content"]).take_all()
        assert {d["doc_id"] for d in docs} == set(ids)
        assert all("content" in d and d["content"] for d in docs)


def test_decode_invariants_match_generator_metadata():
    """decode_invariants reads dims/sample-counts out of the payload BYTES;
    the generator's metadata columns are the independent ground truth (the
    same differential the media_features SQL oracle runs in DuckDB)."""
    from distributed_text_search_ray.pipelines.multimodal import (
        decode_invariants,
        synthetic_media,
    )

    media = synthetic_media(30, seed=5)
    got = {
        r["media_id"]: r
        for r in decode_invariants(ray.data.from_arrow(media)).take_all()
    }
    assert len(got) == 30
    for row in media.to_pylist():
        g = got[row["media_id"]]
        assert g["payload_bytes"] == len(row["payload"])
        if row["format"] == "ppm":
            assert (g["dec_width"], g["dec_height"]) == (row["width"], row["height"])
            assert g["n_samples"] == 0
        elif row["format"] == "wav":
            assert g["n_samples"] == 8 * row["duration_ms"]
            assert (g["dec_width"], g["dec_height"]) == (0, 0)
        else:  # video stub: decode-derived fields are zero by contract
            assert (g["dec_width"], g["dec_height"], g["n_samples"]) == (0, 0, 0)
