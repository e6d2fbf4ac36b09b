"""Pins for the round-4 additions: hashed Naive Bayes classification
(pipelines/classify.py) and distributed BPE tokenizer training
(pipelines/bpe.py) — differential vs pure-Python replays + the layout
and determinism invariants the SQL twins rely on."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

TEXTS = [
    ("the cat sat on the mat", "en"),
    ("the dog ate the cat", "en"),
    ("le chat et le chien", "fr"),
    ("le chien mange le chat", "fr"),
    ("the the the cat runs", "en"),
    ("chat chien le le bon", "fr"),
    ("aaa aa a aaa b", "en"),
    ("zz zz zz zz yy", "fr"),
    ("cats and dogs run fast", "en"),
    ("le le le le", "fr"),
]


def _docs(n_blocks: int = 1):
    items = [
        {"doc_id": i, "content": t, "label": l} for i, (t, l) in enumerate(TEXTS)
    ]
    ds = ray.data.from_items(items)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _tok(s: str) -> list[str]:
    import re

    return [t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t]


# ------------------------------------------------------------------ BPE


def _bpe_reference(texts: list[str], m: int):
    """Pure-Python BPE replay: exact pair counts over the word vocabulary,
    (count desc, lhs asc, rhs asc) argmax, greedy left-to-right merges."""
    wc = Counter(t for s in texts for t in _tok(s))
    words = [(list(w), c) for w, c in wc.items()]
    merges = []
    for rank in range(1, m + 1):
        pairs: Counter = Counter()
        for sym, c in words:
            for p in zip(sym, sym[1:]):
                pairs[p] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        nw = []
        for sym, cnt in words:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nw.append((out, cnt))
        words = nw
    return merges, words


def _apply_all(sym: list[str], merges):
    for _, l, r, _ in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_train_matches_python_reference():
    from distributed_text_search_ray.pipelines.bpe import bpe_train

    merges, _ = _bpe_reference([t for t, _ in TEXTS], 5)
    got = bpe_train(_docs(), num_merges=5).to_pylist()
    assert [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in got
    ] == merges


def test_bpe_train_block_layout_invariant():
    from distributed_text_search_ray.pipelines.bpe import bpe_train

    a = bpe_train(_docs(1), num_merges=4).to_pylist()
    b = bpe_train(_docs(7), num_merges=4).to_pylist()
    assert a == b


def test_bpe_encode_counts_match_reference():
    from distributed_text_search_ray.pipelines.bpe import (
        bpe_encode_token_counts,
        bpe_train,
    )

    m = bpe_train(_docs(), num_merges=5)
    merges = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in m.to_pylist()
    ]
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["n_subtokens"])
        for r in bpe_encode_token_counts(_docs(3), m).take_all()
    )
    want = []
    for i, (t, _) in enumerate(TEXTS):
        toks = _tok(t)
        want.append(
            (i, len(toks), sum(len(_apply_all(list(w), merges)) for w in toks))
        )
    assert got == want


def test_bpe_merge_is_greedy_left_to_right():
    """'a a a' under merge (a,a) -> ['aa','a']; 'a a a a' -> ['aa','aa'] —
    the str.replace-on-wrapped-string semantics the SQL twin replays."""
    from distributed_text_search_ray.pipelines.bpe import _merge_word

    assert _merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_word(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _merge_word(["x", "a", "a", "y"], "a", "a") == ["x", "aa", "y"]


def test_bpe_max_vocab_restricts_merge_evidence():
    """max_vocab keeps only the top words by (cnt desc, term asc); merges
    must then be learned from that restricted vocabulary only."""
    from distributed_text_search_ray.pipelines.bpe import bpe_train, word_counts

    wc = {
        r["term"]: r["cnt"]
        for r in word_counts(_docs()).take_all()
    }
    top3 = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = bpe_train(_docs(), num_merges=2, max_vocab=3).to_pylist()
    pairs: Counter = Counter()
    for w, c in top3:
        for p in zip(w, w[1:]):
            pairs[p] += c
    (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (got[0]["lhs"], got[0]["rhs"], got[0]["pair_count"]) == (l, r, c)


# ------------------------------------------------------- Naive Bayes


def _nb_reference(buckets: int, alpha: float):
    """Pure-Python NB replay with the engine's md5 bucket hash."""
    from distributed_text_search_ray.functions.hashing import md5_u64

    train = [(t, l) for i, (t, l) in enumerate(TEXTS) if i % 2 == 0]
    test = [(i, t) for i, (t, _) in enumerate(TEXTS) if i % 2 == 1]
    labels = sorted({l for _, l in train})
    cnt = {l: Counter() for l in labels}
    ndoc = Counter()
    for t, l in train:
        ndoc[l] += 1
        for w in _tok(t):
            cnt[l][md5_u64(w) % buckets] += 1
    tot = {l: sum(cnt[l].values()) for l in labels}
    ntr = len(train)
    out = {}
    for i, t in test:
        bk = Counter(md5_u64(w) % buckets for w in _tok(t))
        if not bk:
            continue
        best = None
        for l in labels:
            s = math.log((ndoc[l] + alpha) / (ntr + alpha * len(labels)))
            for b in sorted(bk):
                s += bk[b] * math.log(
                    (cnt[l][b] + alpha) / (tot[l] + alpha * buckets)
                )
            s = float(np.round(s, 6))
            if best is None or s > best[1]:
                best = (l, s)
        out[i] = best
    return out


def test_nb_predict_matches_python_reference():
    from distributed_text_search_ray.pipelines.classify import nb_fit, nb_predict

    B, A = 128, 1.0
    model = nb_fit(
        _docs().filter(lambda r: r["doc_id"] % 2 == 0),
        label_col="label",
        buckets=B,
        alpha=A,
    )
    got = {
        r["doc_id"]: (r["predicted"], r["score"])
        for r in nb_predict(
            _docs(4).filter(lambda r: r["doc_id"] % 2 == 1), model
        ).take_all()
    }
    want = _nb_reference(B, A)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)


def test_nb_confusion_sums_to_predictions():
    from distributed_text_search_ray.pipelines.classify import (
        nb_confusion,
        nb_fit,
        nb_predict,
    )

    model = nb_fit(
        _docs().filter(lambda r: r["doc_id"] % 2 == 0),
        label_col="label",
        buckets=64,
    )
    preds = nb_predict(_docs(), model, keep_cols=("label",))
    conf = nb_confusion(preds).take_all()
    assert sum(r["n_docs"] for r in conf) == preds.count()
    # diagonal + off-diagonal cells cover exactly the (truth, predicted)
    # pairs present in the per-doc output
    pairs = Counter(
        (r["label"], r["predicted"]) for r in preds.take_all()
    )
    assert {(r["label"], r["predicted"]): r["n_docs"] for r in conf} == dict(
        pairs
    )


def test_nb_model_is_bounded_and_layout_invariant():
    from distributed_text_search_ray.pipelines.classify import nb_fit

    a = nb_fit(_docs(1), label_col="label", buckets=64)
    b = nb_fit(_docs(6), label_col="label", buckets=64)
    assert a.labels == b.labels
    assert np.array_equal(a.log_prob, b.log_prob)
    assert np.array_equal(a.log_prior, b.log_prior)
    assert a.log_prob.shape == (64, len(a.labels))


# -------------------------------------------------------- source overlap


def test_source_overlap_matches_python_reference():
    from distributed_text_search_ray.pipelines.textstats import source_overlap

    rows = [
        # srcA and srcB share the 3-gram "x y z"; srcC shares nothing
        (0, "x y z q", "srcA"),
        (1, "p x y z", "srcB"),
        (2, "m n o p q", "srcC"),
        (3, "x y z q r", "srcA"),  # duplicate shingles within a source dedup
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "content": t, "source": s} for i, t, s in rows]
    ).repartition(3)
    got = source_overlap(ds, shingle_n=3).to_pylist()

    # python replay
    sets = {}
    for _, t, s in rows:
        toks = t.split()
        sets.setdefault(s, set()).update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    want = []
    for a in sorted(sets):
        for b in sorted(sets):
            if a < b:
                n = len(sets[a] & sets[b])
                if n:
                    j = n / len(sets[a] | sets[b])
                    want.append(
                        {
                            "source_a": a,
                            "source_b": b,
                            "n_shared": n,
                            "jaccard": float(np.round(j, 6)),
                        }
                    )
    assert got == want
    assert any(r["source_a"] == "srcA" and r["source_b"] == "srcB" for r in got)
    assert not any("srcC" in (r["source_a"], r["source_b"]) for r in got)
