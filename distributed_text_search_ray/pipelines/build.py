"""Index build pipeline — streaming, partitioned, resumable.

Phases (each checkpointed, SURVEY.md section 7 phases 1-2 + 5):

A. **tokenize** — one work item per corpus shard; pairs ``(term, doc_id, tf,
   dl)`` written per shard with lineage manifests (skip-on-resume).
B. **dictionary / stats** — partial per-batch (df, cf) aggregation inside
   ``map_batches`` then a small ``groupby(term)`` over partials (pre-aggregate
   before the shuffle, SURVEY.md A1); yields the sorted global term dictionary,
   corpus stats (N, avgdl) and the heavy-hitter set for salting.
C. **segments** — explicit ``part`` key (term-hash, salted for heavy terms),
   ``groupby("part").map_groups(SegmentBuilder)``; completed partitions are
   filtered out before the shuffle on resume.
D. **finalize** — ``index_meta.json`` with global stats, salted-term global
   df (exact idf for split posting lists), per-partition metrics.

The reference analog of the whole file is the plan/exchange/compute/merge
lifecycle of ``src/flexible_mpi.c:290-570``, re-expressed as Dataset stages.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.sources.corpus import corpus_files
from distributed_text_search_ray.stages.segment_build import AssignPartitions, SegmentBuilder
from distributed_text_search_ray.stages.tokenize_stage import TokenizeShard
from distributed_text_search_ray.state import manifest as mf
from distributed_text_search_ray.util import resolve_concurrency

META_FILE = "index_meta.json"


def _partial_term_stats(batch: pa.Table) -> pa.Table:
    """Per-batch partial (term -> df, cf) — combiner before the groupby."""
    terms = np.asarray(batch.column("term").to_pylist(), dtype=object)
    tfs = batch.column("tf").to_numpy()
    uniq, inv = np.unique(terms, return_inverse=True)
    df_part = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    cf_part = np.bincount(inv, weights=tfs.astype(np.float64), minlength=len(uniq)).astype(
        np.int64
    )
    return pa.table(
        {
            "term": pa.array(uniq, type=pa.string()),
            "df_part": pa.array(df_part, type=pa.int64()),
            "cf_part": pa.array(cf_part, type=pa.int64()),
        }
    )


def _make_segment_group_fn(index_dir, fp, cfg, N, avgdl):
    builder = SegmentBuilder(index_dir, fp, cfg, N, avgdl)

    def build_segment_group(group):
        return builder(group)

    return build_segment_group


def read_index_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def build_index(
    corpus_path: str,
    index_dir: str,
    cfg: IndexConfig | None = None,
    *,
    concurrency: int | None = None,
) -> dict:
    """Build (or resume) the inverted index for a corpus.

    Returns a build report: per-phase wall times, work/skip counts, global
    stats. Safe to re-run after a crash: completed shards/partitions are
    skipped via their lineage manifests.
    """
    cfg = cfg or IndexConfig()
    files = corpus_files(corpus_path)
    fp = mf.corpus_fingerprint(files, cfg.fingerprint())
    os.makedirs(index_dir, exist_ok=True)
    report: dict = {"fingerprint": fp, "phases": {}}

    meta_path = os.path.join(index_dir, META_FILE)
    if os.path.exists(meta_path):
        meta = read_index_meta(index_dir)
        if meta.get("fingerprint") == fp and meta.get("complete"):
            report["skipped"] = True
            report.update(meta)
            return report

    pairs_dir = os.path.join(index_dir, "pairs")
    seg_parent = os.path.join(index_dir, "segments")
    mf.gc_tmp_dirs(pairs_dir)
    mf.gc_tmp_dirs(seg_parent)

    # ---- Phase A: tokenize shards -> pairs checkpoint ----
    t0 = time.perf_counter()
    shards = [{"shard_id": i, "file": f} for i, f in enumerate(files)]
    shard_stats = (
        ray.data.from_items(shards)
        .map_batches(
            TokenizeShard,
            fn_constructor_kwargs={"pairs_dir": pairs_dir, "fingerprint": fp, "cfg": cfg},
            batch_size=1,
            batch_format="pyarrow",
            concurrency=resolve_concurrency(concurrency),
        )
        .take_all()
    )
    N = int(sum(r["n_docs"] for r in shard_stats))
    total_tokens = int(sum(r["n_tokens"] for r in shard_stats))
    avgdl = total_tokens / N if N else 0.0
    report["phases"]["tokenize"] = {
        "sec": time.perf_counter() - t0,
        "shards": len(shards),
        "skipped": sum(1 for r in shard_stats if r["skipped"]),
        "n_docs": N,
        "n_tokens": total_tokens,
        "n_pairs": int(sum(r["n_pairs"] for r in shard_stats)),
    }

    pairs_files = sorted(
        os.path.join(pairs_dir, d, "pairs.parquet")
        for d in os.listdir(pairs_dir)
        if d.startswith("shard=")
    )

    # ---- Phase B: dictionary + stats (partial agg then small groupby) ----
    t0 = time.perf_counter()
    dict_dir = os.path.join(index_dir, "dictionary")
    stats_path = os.path.join(index_dir, "stats.json")
    hot_df: dict[str, int] = {}
    if mf.is_complete(dict_dir, fp) and os.path.exists(stats_path):
        with open(stats_path) as f:
            hot_df = {k: int(v) for k, v in json.load(f)["hot_df"].items()}
        report["phases"]["dictionary"] = {"sec": time.perf_counter() - t0, "skipped": True}
    else:
        dictionary = (
            ray.data.read_parquet(pairs_files, columns=["term", "tf"])
            .map_batches(_partial_term_stats, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("df_part", alias_name="df"), Sum("cf_part", alias_name="cf"))
            .sort("term")
        )
        with mf.AtomicDir(dict_dir) as tmp:
            dictionary.write_parquet(tmp)
            mf.write_manifest(tmp, {"kind": "dictionary", "fingerprint": fp})
        hot_threshold = max(2.0, cfg.salt_df_threshold * N)
        hot_rows = (
            ray.data.read_parquet(
                [
                    os.path.join(dict_dir, f)
                    for f in os.listdir(dict_dir)
                    if f.endswith(".parquet")
                ]
            )
            .filter(expr=f"df >= {hot_threshold}")
            .take_all()
        )
        hot_df = {r["term"]: int(r["df"]) for r in hot_rows}
        with open(stats_path + ".tmp", "w") as f:
            json.dump(
                {
                    "fingerprint": fp,
                    "N": N,
                    "total_tokens": total_tokens,
                    "avgdl": avgdl,
                    "hot_df": hot_df,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        os.replace(stats_path + ".tmp", stats_path)
        report["phases"]["dictionary"] = {
            "sec": time.perf_counter() - t0,
            "skipped": False,
            "hot_terms": sorted(hot_df),
        }

    # ---- Phase C: partition + build segments ----
    t0 = time.perf_counter()
    done_parts = [
        p
        for p in range(cfg.num_partitions)
        if mf.is_complete(os.path.join(seg_parent, f"part={p:05d}"), fp)
    ]
    if len(done_parts) < cfg.num_partitions:
        seg_results = (
            # prune at the read: only the 4 pair columns; in particular do NOT
            # let the hive-style `shard=` dir name become a partition column
            # that would ride through the shuffle
            ray.data.read_parquet(pairs_files, columns=["term", "doc_id", "tf", "dl"])
            .map_batches(
                AssignPartitions,
                fn_constructor_kwargs={
                    "cfg": cfg,
                    "hot_terms": sorted(hot_df),
                    "skip_parts": done_parts,
                },
                batch_format="pyarrow",
                concurrency=resolve_concurrency(concurrency),
            )
            .groupby("part")
            .map_groups(_make_segment_group_fn(index_dir, fp, cfg, N, avgdl),
                        batch_format="pyarrow")
            .take_all()
        )
        built = [int(r["part"]) for r in seg_results]
    else:
        built = []
    # partitions with no pairs at all: record an explicit empty manifest so
    # resume and readers see a complete index
    for p in range(cfg.num_partitions):
        seg_dir = os.path.join(seg_parent, f"part={p:05d}")
        if not mf.is_complete(seg_dir, fp):
            from distributed_text_search_ray.state.segment import build_segment_tables, write_segment

            empty = build_segment_tables(
                np.empty(0, object), np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), N, avgdl, cfg,
            )
            with mf.AtomicDir(seg_dir) as tmp:
                checks = write_segment(tmp, empty[0], empty[1], empty[2], empty[3])
                mf.write_manifest(
                    tmp,
                    {"kind": "segment", "part": p, "fingerprint": fp,
                     "checksums": checks, **empty[4]},
                )
    report["phases"]["segments"] = {
        "sec": time.perf_counter() - t0,
        "built": len(built),
        "skipped": len(done_parts),
    }

    # ---- Phase D: finalize ----
    part_stats = {}
    for p in range(cfg.num_partitions):
        m = mf.read_manifest(os.path.join(seg_parent, f"part={p:05d}"))
        part_stats[p] = {k: m[k] for k in ("n_terms", "n_postings", "sum_tf")}
    meta = {
        "fingerprint": fp,
        "config": asdict(cfg),
        "N": N,
        "total_tokens": total_tokens,
        "avgdl": avgdl,
        "hot_df": hot_df,
        "num_partitions": cfg.num_partitions,
        "part_stats": part_stats,
        "complete": True,
    }
    with open(meta_path + ".tmp", "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(meta_path + ".tmp", meta_path)
    report.update(meta)
    return report
