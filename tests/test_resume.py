"""Resumability: a killed build resumes without re-tokenizing completed
partitions (north_rule). Simulated by deleting part of the build state and
re-running — completed shards/partitions must be skipped via their lineage
manifests, and the resumed index must be identical."""

import json
import os
import shutil

from distributed_text_search_ray import IndexConfig
from distributed_text_search_ray.pipelines.build import build_index
from distributed_text_search_ray.pipelines.search import search_topk

CFG = IndexConfig(num_partitions=6, salt_buckets=2)


def test_resume_skips_completed(code_corpus, tmp_path):
    corpus_dir, _ = code_corpus
    index_dir = str(tmp_path / "idx")
    r1 = build_index(corpus_dir, index_dir, CFG)
    assert r1["phases"]["tokenize"]["skipped"] == 0
    baseline = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in search_topk(index_dir, [(0, "def data"), (1, "merge index")]).take_all()
    )

    # simulate a crash mid-build: lose 2 segment partitions + 1 tokenize-shard
    # manifest + the final meta, leave a stale tmp dir behind
    os.remove(os.path.join(index_dir, "index_meta.json"))
    shutil.rmtree(os.path.join(index_dir, "segments", "part=00001"))
    shutil.rmtree(os.path.join(index_dir, "segments", "part=00003"))
    os.remove(
        os.path.join(index_dir, "pairs", "manifests", "shard_00002.parquet.json")
    )
    os.makedirs(os.path.join(index_dir, "segments", ".tmp-part=00001-dead"))

    r2 = build_index(corpus_dir, index_dir, CFG)
    tk = r2["phases"]["tokenize"]
    assert tk["skipped"] == 3  # 3 of 4 shards untouched
    assert tk["n_docs"] == r1["N"]
    assert r2["phases"]["dictionary"]["skipped"] is True
    seg = r2["phases"]["segments"]
    assert seg["skipped"] == 4  # 4 of 6 partitions survived
    assert seg["built"] == 2

    resumed = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in search_topk(index_dir, [(0, "def data"), (1, "merge index")]).take_all()
    )
    assert resumed == baseline


def test_noop_rerun_skips_everything(code_corpus, tmp_path):
    corpus_dir, _ = code_corpus
    index_dir = str(tmp_path / "idx")
    build_index(corpus_dir, index_dir, CFG)
    r2 = build_index(corpus_dir, index_dir, CFG)
    assert r2.get("skipped") is True


def test_input_change_invalidates(code_corpus, tmp_path):
    """Changing the corpus fingerprint forces a rebuild (no stale reuse)."""
    from distributed_text_search_ray.sources.synth import write_corpus

    corpus = tmp_path / "c"
    write_corpus(str(corpus), n_shards=2, docs_per_shard=20, seed=1)
    index_dir = str(tmp_path / "idx")
    r1 = build_index(str(corpus), index_dir, CFG)
    # regenerate with different seed -> different sizes -> new fingerprint
    shutil.rmtree(corpus)
    write_corpus(str(corpus), n_shards=2, docs_per_shard=21, seed=2)
    r2 = build_index(str(corpus), index_dir, CFG)
    assert r2["fingerprint"] != r1["fingerprint"]
    assert r2["phases"]["tokenize"]["skipped"] == 0
    # lineage manifests record the new fingerprint
    m = json.load(
        open(os.path.join(index_dir, "segments", "part=00000", "MANIFEST.json"))
    )
    assert m["fingerprint"] == r2["fingerprint"]


def test_salted_term_in_single_partition_still_searchable(tmp_path):
    """Regression: with salt_buckets=1 every salted term's postings land in
    exactly ONE partition (hash(t#0) % P), which generally differs from its
    base partition — multi-partition detection by n_parts>1 misses it. The
    salted-term union from the shard manifests must route the query side."""
    from distributed_text_search_ray.oracle import oracle_bm25_topk
    from distributed_text_search_ray.pipelines.search import search_topk
    from distributed_text_search_ray.sources.synth import write_corpus
    from tests.conftest import corpus_docs

    corpus = tmp_path / "c"
    write_corpus(str(corpus), n_shards=2, docs_per_shard=30, seed=3)
    cfg = IndexConfig(num_partitions=7, salt_buckets=1, salt_df_threshold=0.3)
    index_dir = str(tmp_path / "idx")
    report = build_index(str(corpus), index_dir, cfg)
    assert report["hot_df"]  # something actually got salted
    docs = corpus_docs(str(corpus))
    queries = [(i, t) for i, t in enumerate(sorted(report["hot_df"]))]
    expected = oracle_bm25_topk(docs, queries, k=5, cfg=cfg)
    got = search_topk(index_dir, queries, topk=5).take_all()
    got_rows = sorted((r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in got)
    assert got_rows == sorted(expected)


def test_incremental_corpus_append(tmp_path):
    """Appending shards to an indexed corpus re-tokenizes ONLY the new shards
    (per-file fingerprints); segments/dictionary rebuild (their inputs
    changed) and results match a from-scratch build of the full corpus."""
    from distributed_text_search_ray.pipelines.search import search_topk
    from distributed_text_search_ray.sources.synth import code_like_shard
    import pyarrow.parquet as pq

    corpus = tmp_path / "c"
    corpus.mkdir()
    for s in range(3):
        pq.write_table(code_like_shard(s, 30, seed=6), corpus / f"shard_{s:05d}.parquet")
    idx = str(tmp_path / "idx")
    r1 = build_index(str(corpus), idx, CFG)
    assert r1["phases"]["tokenize"]["skipped"] == 0

    # append two new shards
    for s in (3, 4):
        pq.write_table(code_like_shard(s, 30, seed=6), corpus / f"shard_{s:05d}.parquet")
    r2 = build_index(str(corpus), idx, CFG)
    assert r2["fingerprint"] != r1["fingerprint"]
    tk = r2["phases"]["tokenize"]
    assert tk["skipped"] == 3 and tk["shards"] == 5  # only new shards tokenized
    assert r2["N"] == 150

    clean = str(tmp_path / "idx_clean")
    build_index(str(corpus), clean, CFG)
    queries = [(0, "def data"), (1, "merge index value"), (2, "self")]
    a = sorted(map(tuple, (r.values() for r in search_topk(idx, queries).take_all())))
    b = sorted(map(tuple, (r.values() for r in search_topk(clean, queries).take_all())))
    assert a == b


def test_corpus_sink_resumes_and_invalidates(tmp_path):
    """write_corpus_resumable: second run skips every complete shard; a
    rewritten input shard or a bumped transform_tag re-executes exactly the
    invalidated work; read_written_corpus round-trips content."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from distributed_text_search_ray.sources.sink import (
        read_written_corpus,
        write_corpus_resumable,
    )
    from distributed_text_search_ray.sources.synth import code_like_shard

    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    os.makedirs(in_dir)
    for s in range(4):
        pq.write_table(
            code_like_shard(s, 30, seed=5), os.path.join(in_dir, f"s{s}.parquet")
        )

    def drop_short(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(pc.utf8_length(t.column("content")), 80))

    r1 = write_corpus_resumable(in_dir, out_dir, drop_short, transform_tag="v1")
    assert r1["shards"] == 4 and r1["skipped"] == 0 and r1["rows_in"] == 120

    r2 = write_corpus_resumable(in_dir, out_dir, drop_short, transform_tag="v1")
    assert r2["skipped"] == 4 and r2["rows_out"] == r1["rows_out"]

    # rewrite one input shard (same doc count, new mtime/content) -> only it re-runs
    pq.write_table(
        code_like_shard(0, 30, seed=99), os.path.join(in_dir, "s0.parquet")
    )
    r3 = write_corpus_resumable(in_dir, out_dir, drop_short, transform_tag="v1")
    assert r3["skipped"] == 3

    # transform version bump invalidates everything
    r4 = write_corpus_resumable(in_dir, out_dir, drop_short, transform_tag="v2")
    assert r4["skipped"] == 0

    # round-trip: sink output == transform applied to the inputs directly
    got = sorted(
        r["content"]
        for r in read_written_corpus(out_dir).take_all()
    )
    want = []
    for f in sorted(os.listdir(in_dir)):
        t = drop_short(pq.read_table(os.path.join(in_dir, f)))
        want.extend(t.column("content").to_pylist())
    assert got == sorted(want) and len(got) == r4["rows_out"]
