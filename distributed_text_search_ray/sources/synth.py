"""Deterministic synthetic corpora (FIXTURES.md profiles).

Mirrors the reference's seeded corpus writer (``src/test_generation.py:57-65,
139-143`` writes random uppercase files with ``random.seed(0)``) but emits the
canonical Parquet corpus schema. Generation is per-shard with a seed derived
from ``(seed, shard)``, so shards can be produced independently (and in
parallel by Ray tasks for the big scaling-bench corpus) while staying fully
deterministic.

The ``code_like`` profile draws tokens from a Zipfian vocabulary where
``def``/``import``/``return``/``self`` reach document frequency ~0.9 —
exercising the salted-skew path (north_rule skew clause). It also plants
near-duplicate clone pairs (small edits of a base doc) for the dedup
operators.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HOT_TERMS = ["def", "import", "return", "self"]

_VOCAB_CORE = [
    "data", "index", "query", "token", "batch", "shard", "merge", "score",
    "count", "value", "table", "block", "cache", "write", "read", "parse",
    "hash", "sort", "scan", "group", "limit", "spill", "actor", "plan",
]


def make_vocab(size: int, seed: int = 0) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = list(_VOCAB_CORE)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    while len(vocab) < size:
        n = int(rng.integers(3, 12))
        vocab.append("".join(rng.choice(letters, n)) + f"_{len(vocab)}")
    return vocab[:size]


def _shard_rng(seed: int, shard: int) -> np.random.Generator:
    return np.random.default_rng((seed * 1_000_003 + shard) & 0xFFFFFFFF)


def code_like_shard(
    shard: int,
    docs_per_shard: int,
    seed: int = 0,
    vocab_size: int = 2000,
    mean_tokens: int = 120,
    clone_fraction: float = 0.05,
) -> pa.Table:
    """One shard of the code_like corpus as an Arrow table."""
    vocab = np.array(make_vocab(vocab_size, seed), dtype=object)
    # Zipf-ish weights over the vocabulary
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    weights = 1.0 / ranks
    weights /= weights.sum()
    rng = _shard_rng(seed, shard)
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    langs = ["py", "c", "rs", "js"]
    base_doc_tokens: list[str] | None = None
    for i in range(docs_per_shard):
        n_tok = max(1, int(rng.poisson(mean_tokens)))
        body = vocab[rng.choice(vocab_size, n_tok, p=weights)].tolist()
        # hot terms appear in ~90% of docs
        for h, hot in enumerate(HOT_TERMS):
            if rng.random() < 0.9:
                pos = int(rng.integers(0, len(body) + 1))
                body.insert(pos, hot)
        if base_doc_tokens is None:
            base_doc_tokens = body
        if rng.random() < clone_fraction and base_doc_tokens is not None:
            # near-duplicate: clone an earlier doc with a couple of edits
            body = list(base_doc_tokens)
            for _ in range(2):
                body[int(rng.integers(0, len(body)))] = str(
                    vocab[int(rng.integers(0, vocab_size))]
                )
        text = " ".join(body)
        rows["repo"].append(f"repo{shard}")
        rows["path"].append(f"src/file{shard}_{i}.py")
        rows["commit"].append(hashlib.sha1(f"{seed}:{shard}:{i}".encode()).hexdigest())
        rows["lang"].append(langs[i % len(langs)])
        rows["content"].append(text)
    return pa.table(
        {k: pa.array(v, type=pa.string()) for k, v in rows.items()}
    )


def dna_shard(shard: int, docs_per_shard: int, doc_len: int, seed: int = 0) -> pa.Table:
    """Reference-style corpus: random uppercase A-Z strings
    (test_generation.py:57-65)."""
    rng = _shard_rng(seed, shard)
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in range(docs_per_shard):
        n = max(1, int(rng.integers(1, doc_len + 1)))
        rows["repo"].append(f"dna{shard}")
        rows["path"].append(f"{shard}_{i}.txt")
        rows["commit"].append("")
        rows["lang"].append("txt")
        rows["content"].append("".join(rng.choice(letters, n)))
    return pa.table({k: pa.array(v, type=pa.string()) for k, v in rows.items()})


def write_corpus(
    out_dir: str,
    n_shards: int = 4,
    docs_per_shard: int = 100,
    profile: str = "code_like",
    seed: int = 0,
    **kw,
) -> list[str]:
    """Write a sharded corpus; returns the (sorted) shard file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s in range(n_shards):
        if profile == "code_like":
            t = code_like_shard(s, docs_per_shard, seed=seed, **kw)
        elif profile == "dna":
            t = dna_shard(s, docs_per_shard, seed=seed, **kw)
        else:
            raise ValueError(f"unknown profile {profile}")
        p = os.path.join(out_dir, f"shard_{s:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths
