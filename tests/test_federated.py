"""Federated cross-index search (no physical merge).

Contract: querying N disjoint indexes through ``search_topk_federated`` is
bit-identical (doc ids AND float64 scores) to querying one index built over
the union corpus — global stats are recombined exactly (N/avgdl from integer
totals, per-term df summed). This is the logical-query sibling of
``merge_indexes`` (same disjoint-doc-id contract, merge.py:181) for the
cluster layout where indexes live per time-slice/tenant and moving postings
is the expensive part.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from distributed_text_search_ray.config import AnalyzerConfig, IndexConfig
from distributed_text_search_ray.pipelines.build import build_index
from distributed_text_search_ray.pipelines.search import (
    search_topk,
    search_topk_federated,
)
from tests.conftest import corpus_docs

QUERIES = [
    (0, "def tokenize"),
    (1, "import data index"),
    (2, "merge"),
    (3, "zzz_not_a_term"),
    (4, "def"),  # hot (salted) term — df recombination must stay exact
    (5, "score count value table"),
]

CFG = IndexConfig(num_partitions=8, salt_buckets=3, salt_df_threshold=0.25)


@pytest.fixture(scope="module")
def full_and_halves(code_corpus, tmp_path_factory):
    corpus_dir, _ = code_corpus
    root = tmp_path_factory.mktemp("fed")
    full_idx = str(root / "full")
    build_index(corpus_dir, full_idx, CFG)

    docs = corpus_docs(corpus_dir)
    halves = []
    for par in (0, 1):
        cdir = str(root / f"corpus{par}")
        os.makedirs(cdir)
        part = [(d, c) for d, c in docs if d % 2 == par]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([d for d, _ in part], type=pa.int64()),
                    "content": pa.array([c for _, c in part], type=pa.string()),
                }
            ),
            os.path.join(cdir, "shard-0.parquet"),
        )
        idx = str(root / f"idx{par}")
        build_index(cdir, idx, CFG)
        halves.append(idx)
    return full_idx, halves


def _rows(ds):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in ds.take_all()
    )


@pytest.mark.parametrize("mode", ["taat", "maxscore"])
def test_federated_bitexact_vs_union_index(full_and_halves, mode):
    full_idx, halves = full_and_halves
    expected = _rows(search_topk(full_idx, QUERIES, topk=10, mode="taat"))
    got = _rows(search_topk_federated(halves, QUERIES, topk=10, mode=mode))
    assert got == expected  # includes bit-exact float64 scores


def test_federated_single_member_is_plain_search(full_and_halves):
    full_idx, _ = full_and_halves
    expected = _rows(search_topk(full_idx, QUERIES, topk=10, mode="taat"))
    got = _rows(search_topk_federated([full_idx], QUERIES, topk=10))
    assert got == expected


def test_federated_rejects_wand_and_mixed_analyzers(full_and_halves, tmp_path_factory, code_corpus):
    from distributed_text_search_ray.stages.executor import (
        FederatedIndexView,
        FederatedQueryExecutor,
    )

    full_idx, halves = full_and_halves
    with pytest.raises(ValueError, match="wand"):
        FederatedQueryExecutor(halves, mode="wand")

    corpus_dir, _ = code_corpus
    other = str(tmp_path_factory.mktemp("other") / "idx")
    build_index(
        corpus_dir,
        other,
        IndexConfig(num_partitions=4, analyzer=AnalyzerConfig(stem="s")),
    )
    with pytest.raises(ValueError, match="analyzer"):
        FederatedIndexView([halves[0], other])


def test_federated_global_stats_exact(full_and_halves):
    from distributed_text_search_ray.stages.executor import (
        FederatedIndexView,
        IndexView,
    )

    full_idx, halves = full_and_halves
    fv = FederatedIndexView(halves)
    uv = IndexView(full_idx)
    assert fv.N == uv.N
    assert fv.avgdl == uv.avgdl  # int-ratio recombination, not a float sum
    for term in ("def", "data", "merge"):
        _, _, _, df_f = fv.term_postings(term)
        _, _, _, df_u = uv.term_postings(term)
        assert df_f == df_u
