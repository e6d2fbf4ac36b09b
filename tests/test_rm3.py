"""Pin RM3 pseudo-relevance-feedback expansion (search.py rm3_topk).

Contract: feedback = rounded-rank BM25 top-fb_docs; relevance model
p(t) = (1/k0) sum_fb tf/dl; expansion = top-fb_terms by (round(p,12) DESC,
term); w(t) = lam*[t in Q]/|Q| + (1-lam)*p/psum; final score =
sum_t w_t * (idf * tf_part), weighted TAAT. Differential vs an in-test
pure-Python RM3 oracle on the synthetic code corpus, plus the lam=1
degeneracy (ranking == plain BM25)."""

import math
import re
from collections import Counter

import numpy as np
import pytest
import ray.data

from distributed_text_search_ray.pipelines.search import rm3_topk, search_topk
from distributed_text_search_ray.util import round_half_away

from tests.conftest import corpus_docs

QUERIES = [(0, "spark table join"), (1, "tokenizer"), (2, "shuffle partition hash")]


def _tok(text):
    return re.findall(r"[a-z0-9_]+", text.lower())


def _brute_rm3(docs, queries, fb_docs, fb_terms, lam, topk):
    """Independent RM3: plain-Python floats, same rounding discipline."""
    toks = {d: _tok(c) for d, c in docs}
    N = float(len(docs))
    dl = {d: float(len(t)) for d, t in toks.items()}
    avgdl = sum(dl.values()) / N
    tf = {d: Counter(t) for d, t in toks.items()}
    df = Counter()
    for d, c in tf.items():
        df.update(c.keys())

    def contrib(t, d):
        if t not in tf[d]:
            return 0.0
        idf = math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5))
        x = float(tf[d][t])
        return idf * (x * 2.2 / (x + 1.2 * (1 - 0.75 + 0.75 * dl[d] / avgdl)))

    out = []
    for qid, q in queries:
        qterms = sorted(set(_tok(q)))
        # pass 1
        sc = {}
        for d, _ in docs:
            s = sum(contrib(t, d) for t in qterms)
            if s > 0:
                sc[d] = s
        ranked = sorted(sc, key=lambda d: (-round_half_away(sc[d], 6), d))
        fb = sorted(ranked[:fb_docs])
        # relevance model
        p = {}
        for d in fb:
            for t, c in tf[d].items():
                p[t] = p.get(t, 0.0) + float(c) / dl[d]
        p = {t: v / float(len(fb)) for t, v in p.items()} if fb else {}
        sel = sorted(p, key=lambda t: (-round_half_away(p[t], 12), t))[:fb_terms]
        psum = sum(p[t] for t in sorted(sel))
        w = {t: lam / float(len(qterms)) for t in qterms}
        for t in sel:
            if psum > 0:
                w[t] = w.get(t, 0.0) + (1.0 - lam) * (p[t] / psum)
        # pass 2
        sc2 = {}
        for d, _ in docs:
            s = 0.0
            for t in sorted(w):
                s += w[t] * contrib(t, d)
            if s > 0:
                sc2[d] = round_half_away(s, 6)
        ranked2 = sorted(sc2, key=lambda d: (-sc2[d], d))[:topk]
        for r, d in enumerate(ranked2, start=1):
            out.append((qid, r, d, sc2[d]))
    return sorted(out)


def test_rm3_matches_brute(built_index_r3):
    corpus_dir, index_dir = built_index_r3
    docs = corpus_docs(corpus_dir)
    docs_ds = ray.data.from_items(
        [{"doc_id": d, "content": c} for d, c in docs]
    )
    rows = rm3_topk(
        index_dir, QUERIES, docs_ds, fb_docs=5, fb_terms=8, lam=0.6, topk=15
    ).take_all()
    got = []
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        d = np.array([r["doc_id"] for r in rs], dtype=np.int64)
        s = round_half_away(np.array([r["score"] for r in rs]), 6)
        order = np.lexsort((d, -s))[:7]
        for rank, i in enumerate(order, start=1):
            got.append((qid, rank, int(d[i]), float(s[i])))
    want = [x for x in _brute_rm3(docs, QUERIES, 5, 8, 0.6, 7)]
    assert sorted(got) == pytest.approx(want) or sorted(got) == want


def test_rm3_lam1_degenerates_to_bm25(built_index_r3):
    corpus_dir, index_dir = built_index_r3
    docs_ds = ray.data.from_items(
        [{"doc_id": d, "content": c} for d, c in corpus_docs(corpus_dir)]
    )
    rm3 = rm3_topk(
        index_dir, QUERIES, docs_ds, fb_docs=5, fb_terms=8, lam=1.0, topk=10
    ).take_all()
    plain = search_topk(index_dir, QUERIES, topk=10).take_all()

    def ranked_ids(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        out = {}
        for qid, rs in by_q.items():
            d = np.array([r["doc_id"] for r in rs], dtype=np.int64)
            s = round_half_away(np.array([r["score"] for r in rs]), 6)
            out[qid] = d[np.lexsort((d, -s))].tolist()
        return out

    # lam=1 scales every BM25 score by the positive constant 1/|Q| — the
    # RANKING must be identical (scores differ by that factor)
    assert ranked_ids(rm3) == ranked_ids(plain)


def test_rm3_expansion_changes_recall(built_index_r3):
    corpus_dir, index_dir = built_index_r3
    docs_ds = ray.data.from_items(
        [{"doc_id": d, "content": c} for d, c in corpus_docs(corpus_dir)]
    )
    rm3 = rm3_topk(
        index_dir, QUERIES, docs_ds, fb_docs=5, fb_terms=8, lam=0.3, topk=200
    ).take_all()
    plain = search_topk(index_dir, QUERIES, topk=200).take_all()
    # expansion terms pull in docs sharing NO original query term: the
    # lam=0.3 match set must strictly contain the plain one for some query
    rm3_docs = {(r["query_id"], r["doc_id"]) for r in rm3}
    plain_docs = {(r["query_id"], r["doc_id"]) for r in plain}
    assert plain_docs <= rm3_docs
    assert len(rm3_docs) > len(plain_docs)
