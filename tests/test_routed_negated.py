"""Pin must_not (``-term``) retrieval and routed per-member search.

must_not contract (ES bool must + must_not): negated terms mask the
candidate set; surviving docs keep their exact unrestricted BM25 scores.
Routed contract: each query is answered entirely inside its route's member
index with MEMBER-LOCAL stats; an unknown route yields no rows.
"""

import pytest
import ray.data


def _scores(rows):
    return {r["doc_id"]: r["score"] for r in rows}


def test_parse_negated_query():
    from distributed_text_search_ray.pipelines.search import parse_negated_query

    assert parse_negated_query("a b -c d -e") == ("a b d", "c e")
    assert parse_negated_query("-only") == ("", "only")
    assert parse_negated_query("a - b") == ("a b", "")  # lone '-' ignored
    assert parse_negated_query("plain query") == ("plain query", "")


def test_negated_masks_without_rescoring(built_index_r3):
    from distributed_text_search_ray.pipelines.search import (
        search_topk,
        search_topk_negated,
    )

    _, index_dir = built_index_r3
    plain = search_topk(index_dir, [(0, "def return value")], topk=500).take_all()
    plain_by_doc = _scores(plain)
    neg = search_topk_negated(
        index_dir, [(0, "def return value -class")], topk=10
    ).take_all()
    assert neg, "expected survivors"
    excluded = {
        r["doc_id"]
        for r in search_topk(index_dir, [(0, "class")], topk=10_000).take_all()
    }
    for r in neg:
        assert r["doc_id"] not in excluded
        # survivor scores are bit-identical to the unrestricted scores
        assert r["score"] == pytest.approx(plain_by_doc[r["doc_id"]], abs=0)
    # expected = top-k of the plain ranking with excluded docs removed
    survivors = [r for r in plain if r["doc_id"] not in excluded][: len(neg)]
    assert [r["doc_id"] for r in neg] == [r["doc_id"] for r in survivors]


def test_negated_edge_shapes(built_index_r3):
    from distributed_text_search_ray.pipelines.search import (
        search_topk,
        search_topk_negated,
    )

    _, index_dir = built_index_r3
    # negating an absent term is a no-op
    noop = search_topk_negated(
        index_dir, [(0, "def return -zzz_not_a_term")], topk=5
    ).take_all()
    plain = search_topk(index_dir, [(0, "def return")], topk=5).take_all()
    assert [(r["doc_id"], r["score"]) for r in noop] == [
        (r["doc_id"], r["score"]) for r in plain
    ]
    # self-negation and negation-only queries return no rows
    assert search_topk_negated(index_dir, [(1, "def -def")], topk=5).take_all() == []
    assert search_topk_negated(index_dir, [(2, "-def")], topk=5).take_all() == []


@pytest.fixture(scope="module")
def routed_members(code_corpus, tmp_path_factory):
    """Two member indexes split by shard file — standalone corpora with
    their own stats, exactly the per-tenant layout routing targets."""
    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.build import build_index
    from distributed_text_search_ray.sources.corpus import corpus_files

    corpus_dir, _ = code_corpus
    files = corpus_files(corpus_dir)
    root = tmp_path_factory.mktemp("routed")
    members = {}
    for name, shard_files in (("even", files[0::2]), ("odd", files[1::2])):
        member_corpus = str(root / f"c_{name}")
        ray.data.read_parquet(shard_files).write_parquet(member_corpus)
        idx = str(root / f"i_{name}")
        build_index(member_corpus, idx, IndexConfig(num_partitions=2))
        members[name] = idx
    return members


def test_routed_uses_member_local_stats(routed_members):
    from distributed_text_search_ray.pipelines.search import (
        search_topk,
        search_topk_routed,
    )

    q = "def return value class"
    routed = search_topk_routed(
        routed_members,
        [(0, q, "even"), (1, q, "odd"), (2, q, "missing_route")],
        topk=5,
    ).take_all()
    # each routed answer equals a standalone search of that member alone
    for qid, route in ((0, "even"), (1, "odd")):
        want = search_topk(routed_members[route], [(qid, q)], topk=5).take_all()
        got = [r for r in routed if r["query_id"] == qid]
        assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == [
            (r["rank"], r["doc_id"], r["score"]) for r in want
        ]
    # member corpora differ, so member-local stats differ: the same query
    # must not produce identical score lists from both routes
    s_even = [r["score"] for r in routed if r["query_id"] == 0]
    s_odd = [r["score"] for r in routed if r["query_id"] == 1]
    assert s_even != s_odd
    # unknown route contributes no rows
    assert not [r for r in routed if r["query_id"] == 2]
