"""Pin reshard_index (ES shrink/split analog): re-partitioning a built
index to k*P or P/k partitions without re-tokenizing must be rank- AND
score-identical to the source index under every scorer, including salted
hot terms and positional (v4) segments."""

import pytest

from distributed_text_search_ray import IndexConfig
from distributed_text_search_ray.pipelines.build import build_index
from distributed_text_search_ray.pipelines.merge import reshard_index
from distributed_text_search_ray.pipelines.search import search_topk

QUERIES = [(0, "spark table join"), (1, "def tokenize"), (2, "partition"),
           (3, "the data")]


def _rows(index_dir, mode="taat"):
    rows = search_topk(index_dir, QUERIES, topk=20, mode=mode).take_all()
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"]) for r in rows
    )


@pytest.fixture(scope="module")
def salted_index(code_corpus, tmp_path_factory):
    corpus_dir, _ = code_corpus
    idx = str(tmp_path_factory.mktemp("reshard") / "idx")
    build_index(
        corpus_dir, idx,
        IndexConfig(num_partitions=4, salt_buckets=2, salt_df_threshold=0.5),
    )
    return idx


def test_split_identical(salted_index, tmp_path):
    out = str(tmp_path / "split8")
    rep = reshard_index(salted_index, out, 8)
    assert rep["mode"] == "split" and rep["num_partitions"] == 8
    assert _rows(out) == _rows(salted_index)
    assert _rows(out, mode="wand") == _rows(salted_index, mode="wand")


def test_shrink_identical(salted_index, tmp_path):
    out = str(tmp_path / "shrink2")
    rep = reshard_index(salted_index, out, 2)
    assert rep["mode"] == "shrink" and rep["num_partitions"] == 2
    assert _rows(out) == _rows(salted_index)
    assert _rows(out, mode="maxscore") == _rows(salted_index)


def test_reshard_resumes(salted_index, tmp_path):
    out = str(tmp_path / "split8r")
    reshard_index(salted_index, out, 8)
    rep2 = reshard_index(salted_index, out, 8)
    assert rep2.get("skipped") is True


def test_reshard_rejects_bad_counts(salted_index, tmp_path):
    with pytest.raises(ValueError):
        reshard_index(salted_index, str(tmp_path / "x1"), 4)
    with pytest.raises(ValueError):
        reshard_index(salted_index, str(tmp_path / "x2"), 6)
    with pytest.raises(ValueError):
        reshard_index(salted_index, str(tmp_path / "x3"), 3)


def test_split_positional_phrase_identical(code_corpus, tmp_path):
    from distributed_text_search_ray.pipelines.phrase import (
        phrase_search_positional,
    )

    corpus_dir, _ = code_corpus
    idx = str(tmp_path / "pidx")
    build_index(
        corpus_dir, idx, IndexConfig(num_partitions=4, store_positions=True)
    )
    out = str(tmp_path / "psplit")
    reshard_index(idx, out, 8)
    phrases = [(0, "def tokenize"), (1, "spark table")]

    def prows(d):
        return sorted(
            tuple(sorted(r.items()))
            for r in phrase_search_positional(d, phrases).take_all()
        )

    assert prows(out) == prows(idx)
