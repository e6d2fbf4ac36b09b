"""Stable hashing utilities.

Everything here must be deterministic across processes and Python versions
(``hash()`` is salted per process — never used). Term partitioning, doc-id
fingerprints, minhash/simhash and the rolling fingerprint all build on
blake2b/md5/sha256 from hashlib plus numpy splitmix-style mixing.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_u64(s: str) -> int:
    """Stable 64-bit hash of a string (blake2b, 8-byte digest)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def doc_fingerprint(repo: str, path: str) -> int:
    """Deterministic non-negative int63 doc id from identity ``(repo, path)``.

    Replaces the reference's rank-order doc identity (file ``i`` = rank ``i``,
    ``src/flexible_mpi.c:232-233``) with a sort-free, cluster-stable id — no
    global sort needed at 10^12-file scale.
    """
    h = hashlib.blake2b(digest_size=8)
    h.update(repo.encode("utf-8"))
    h.update(b"\x00")
    h.update(path.encode("utf-8"))
    return int.from_bytes(h.digest(), "little") & 0x7FFFFFFFFFFFFFFF


def term_partition(term: str, num_partitions: int) -> int:
    return stable_u64(term) % num_partitions


def term_partitions_batch(terms: np.ndarray, num_partitions: int) -> np.ndarray:
    """Vector-ish partition assignment (hashlib per distinct term via cache)."""
    uniq, inv = np.unique(terms.astype(object), return_inverse=True)
    parts = np.fromiter(
        (term_partition(t, num_partitions) for t in uniq), dtype=np.int64, count=len(uniq)
    )
    return parts[inv]


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants), vectorized."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int, seed: int = 0) -> np.ndarray:
    """MinHash signature of a set of 64-bit shingle hashes.

    Universal-hash family h_i(x) = splitmix64(x ^ key_i); signature is the
    min per permutation. Empty set -> all MAX (never collides with real sets
    in LSH buckets because we skip empty docs upstream).
    """
    keys = splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64))
    if shingle_hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[:, None] ^ keys[None, :]
    return splitmix64(x).min(axis=0)


_token_hash_cache: dict[str, int] = {}


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """stable_u64 per token with a process-level cache (vocabularies are
    small relative to token streams)."""
    c = _token_hash_cache
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = c.get(t)
        if h is None:
            h = stable_u64(t)
            if len(c) < 1_000_000:
                c[t] = h
        out[i] = h
    return out


def shingle_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Distinct hashes of n-gram token shingles.

    Shingle hash = splitmix64 fold of the n token hashes with positional
    multipliers — fully vectorized over the token stream (hashing each
    shingle string individually profiled ~10x slower); deterministic across
    processes."""
    return np.unique(shingle_hashes_all(tokens, n))


def shingle_hashes_all(tokens: list[str], n: int = 3) -> np.ndarray:
    """One hash per n-gram window in positional order, duplicates kept.

    Same fold as ``shingle_hashes`` (which is just the unique of this), so
    the two interoperate: a window-level operator and a set-level operator
    agree on which shingles are equal. Docs shorter than ``n`` tokens get
    one window covering all tokens (matching the SQL oracles' CASE arm)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    th = _token_hashes(tokens)
    if len(tokens) < n:
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(len(tokens)):
            acc = splitmix64(acc * np.uint64(0x9E3779B97F4A7C15) + th[j : j + 1])
        return acc
    acc = th[: len(th) - n + 1].copy()
    for j in range(1, n):
        acc = splitmix64(acc * np.uint64(0x9E3779B97F4A7C15) + th[j : len(th) - n + 1 + j])
    return acc


def minhash_signatures_batch(
    shingles_concat: np.ndarray,
    doc_starts: np.ndarray,
    num_perm: int,
    seed: int = 0,
) -> np.ndarray:
    """MinHash signatures for many docs at once: (n_docs, num_perm).

    ``shingles_concat``: all docs' shingle hashes concatenated;
    ``doc_starts``: start offset per doc (first 0). 128 vectorized
    min-reduceat passes beat per-doc signature calls ~10x. Empty docs (zero
    shingles) must be filtered by the caller."""
    keys = splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64))
    n_docs = len(doc_starts)
    out = np.empty((n_docs, num_perm), dtype=np.uint64)
    x = shingles_concat.astype(np.uint64)
    for i in range(num_perm):
        mixed = splitmix64(x ^ keys[i])
        out[:, i] = np.minimum.reduceat(mixed, doc_starts)
    return out


def md5_u64(s: str) -> int:
    """64-bit token hash = little-endian of the LAST 8 md5 digest bytes.

    Chosen to equal DuckDB's ``md5_number_lower`` so simhash fingerprints are
    SQL-oracle-checkable bit-for-bit (verified empirically against duckdb
    1.0.0)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


_md5_hash_cache: dict[str, int] = {}


def _md5_token_hashes(tokens: list[str]) -> np.ndarray:
    c = _md5_hash_cache
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = c.get(t)
        if h is None:
            h = md5_u64(t)
            if len(c) < 1_000_000:
                c[t] = h
        out[i] = h
    return out


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token unigrams (weight = term frequency).

    Token hash is ``md5_u64`` (= DuckDB md5_number_lower), bit b of the
    fingerprint is 1 iff sum over distinct hashes of (+tf if bit set else
    -tf) > 0. Grouping by hash instead of by term is contribution-identical
    (a hash's bit vector is fixed, weights are additive)."""
    if not tokens:
        return 0
    th = _md5_token_hashes(tokens)
    uniq, w = np.unique(th, return_counts=True)
    bits = ((uniq[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = ((2 * bits - 1) * w[:, None].astype(np.int64)).sum(axis=0)
    return int(sum(1 << int(b) for b in np.flatnonzero(acc > 0)))


_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count of a uint64 array (numpy<2 has no
    bitwise_count)."""
    b = np.ascontiguousarray(x.astype(np.uint64)).view(np.uint8).reshape(-1, 8)
    return _POP8[b].sum(axis=1, dtype=np.int64)


def rolling_fingerprint(text: str, base: int = 1000003, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash of the whole text (document fingerprint)."""
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h
