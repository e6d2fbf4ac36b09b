"""Exact cross-source doc-id disjointness validation for index merges.

The in-merge per-part check is best-effort: a doc present in two sources
with token sets that hash to DISJOINT partition sets is never seen from
both sources in any one part. ``validate_doc_disjointness`` closes that
gap with a global distributed doc-id-set comparison — these tests pin
both the clean-pass and the exact adversarial miss case."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributed_text_search_ray import IndexConfig
from distributed_text_search_ray.functions.hashing import term_partition
from distributed_text_search_ray.pipelines.build import build_index
from distributed_text_search_ray.pipelines.merge import (
    merge_indexes,
    validate_doc_disjointness,
)


def _write_shard(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "content": pa.array([r[1] for r in rows], type=pa.string()),
            }
        ),
        path,
    )


def _mk_index(tmp_path, name, rows, cfg):
    corpus = tmp_path / f"corpus_{name}"
    corpus.mkdir()
    _write_shard(str(corpus / "shard_00000.parquet"), rows)
    idx = str(tmp_path / f"idx_{name}")
    build_index(str(corpus), idx, cfg)
    return idx


def test_validate_disjoint_passes_and_merge_works(tmp_path):
    cfg = IndexConfig(num_partitions=4)
    a = _mk_index(tmp_path, "a", [(1, "alpha beta"), (2, "gamma delta")], cfg)
    b = _mk_index(tmp_path, "b", [(3, "alpha epsilon"), (4, "zeta beta")], cfg)
    validate_doc_disjointness([a, b])  # no raise
    rep = merge_indexes([a, b], str(tmp_path / "merged"), validate_disjoint=True)
    assert rep["N"] == 4


def test_validator_catches_overlap_invisible_to_per_part_check(tmp_path):
    # adversarial construction: doc 7 exists in BOTH sources with token
    # sets routed to DISJOINT partitions, so no single part ever sees it
    # from both sources and the in-merge best-effort check cannot fire
    nparts = 4
    vocab = [f"tok{i}" for i in range(64)]
    by_part = {}
    for t in vocab:
        by_part.setdefault(term_partition(t, nparts), []).append(t)
    parts = sorted(by_part)
    assert len(parts) >= 2
    t1, t2 = by_part[parts[0]][0], by_part[parts[1]][0]
    assert term_partition(t1, nparts) != term_partition(t2, nparts)

    cfg = IndexConfig(num_partitions=nparts)
    a = _mk_index(tmp_path, "a", [(7, f"{t1} {t1}"), (1, "filler one")], cfg)
    b = _mk_index(tmp_path, "b", [(7, f"{t2} {t2}"), (2, "filler two")], cfg)

    # the best-effort in-merge check misses it: the merge COMPLETES with a
    # silently double-counted N — exactly the documented gap
    rep = merge_indexes([a, b], str(tmp_path / "merged_bad"))
    assert rep["N"] == 4  # 7 counted twice: 3 distinct docs + 1 double-count

    with pytest.raises(ValueError, match="share doc ids"):
        validate_doc_disjointness([a, b])
    with pytest.raises(ValueError, match="share doc ids"):
        merge_indexes([a, b], str(tmp_path / "merged_bad2"), validate_disjoint=True)
    assert not os.path.exists(str(tmp_path / "merged_bad2" / "index_meta.json"))
