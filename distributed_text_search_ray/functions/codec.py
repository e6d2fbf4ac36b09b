"""Delta + varbyte posting-list compression, vectorized with numpy.

Format: classic little-endian varbyte — each value is stored as 7-bit groups,
least-significant first; every byte except the last of a value has the high
(continuation) bit set. Posting doc-ids are delta-encoded within each list
(first id absolute) before varbyte packing.

Both encode and decode are fully vectorized: encoding computes per-value byte
widths with bit-length math and scatters 7-bit groups with cumsum offsets;
decoding finds value terminators (``byte & 0x80 == 0``), assigns group ids with
a cumulative sum, and horners the 7-bit groups back together. A pure-Python
reference implementation lives in the unit tests and the two are fuzz-tested
against each other (hypothesis).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # enough for uint64


def varbyte_width(values: np.ndarray) -> np.ndarray:
    """Number of output bytes per value (1..10). values: uint64 array."""
    v = np.asarray(values, dtype=np.uint64)
    # bit length: 64 - clz; numpy has no clz, use log2 via float for <2^53 and
    # a loop-free fallback for the general case.
    widths = np.ones(v.shape, dtype=np.int64)
    x = v >> np.uint64(7)
    while x.any():
        widths += (x > 0).astype(np.int64)
        x = x >> np.uint64(7)
    return widths


def varbyte_encode(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array into a varbyte stream.

    Returns ``(stream, widths)`` where ``stream`` is a uint8 array and
    ``widths[i]`` is the number of bytes value ``i`` occupies (so callers can
    compute slice offsets per posting list with a cumsum).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64)
    widths = varbyte_width(v)
    total = int(widths.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(widths)[:-1]))
    # Scatter 7-bit group j of every value that has at least j+1 bytes.
    maxw = int(widths.max())
    remaining = v.copy()
    for j in range(maxw):
        has = widths > j
        idx = starts[has] + j
        group = (remaining[has] & np.uint64(0x7F)).astype(np.uint8)
        cont = (widths[has] > j + 1).astype(np.uint8) << 7
        out[idx] = group | cont
        remaining = remaining >> np.uint64(7)
    return out, widths


def varbyte_decode(stream: np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream back into a uint64 array.

    ``count`` (if given) asserts the expected number of values.

    Hot-path layout: most streams are dominated by 1-2 byte values (doc-id
    deltas of frequent terms are tiny; tf is small; dl < 16k), so decoding
    proceeds per byte-length class — a handful of fully vectorized gathers —
    instead of a cumsum + scatter-add over the whole byte stream (which
    profiled ~10x slower on long posting lists).
    """
    b = np.ascontiguousarray(stream, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    if is_end.all():  # pure 1-byte stream
        if count is not None and b.size != count:
            raise ValueError(f"varbyte stream holds {b.size} values, expected {count}")
        return b.astype(np.uint64)
    ends = np.flatnonzero(is_end)
    n_vals = ends.size
    if count is not None and n_vals != count:
        raise ValueError(f"varbyte stream holds {n_vals} values, expected {count}")
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    np.add(ends[:-1], 1, out=starts[1:])
    lens = ends - starts + 1
    vals = np.empty(n_vals, dtype=np.uint64)
    # payload stays uint8; only per-class SUBSETS widen to uint64 (the
    # whole-stream uint64 conversion was 8x the memory traffic). Classes
    # found with bincount, not np.unique (which sorts all n_vals).
    payload8 = b & np.uint8(0x7F)
    counts = np.bincount(lens, minlength=_MAX_BYTES + 1)
    for L in range(1, _MAX_BYTES + 1):
        if not counts[L]:
            continue
        m = lens == L
        s = starts[m]
        acc = payload8[s].astype(np.uint64)
        for j in range(1, L):
            acc |= payload8[s + j].astype(np.uint64) << np.uint64(7 * j)
        vals[m] = acc
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids -> uint64 deltas (first absolute)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint64)
    d = np.empty(a.shape, dtype=np.int64)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    if a.size > 1 and (d[1:] <= 0).any():
        raise ValueError("delta_encode requires strictly increasing ids")
    if d[0] < 0:
        raise ValueError("delta_encode requires non-negative ids")
    return d.astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode` (uint64 deltas -> int64 ids)."""
    d = np.asarray(deltas, dtype=np.uint64)
    return np.cumsum(d.astype(np.int64))


def segmented_delta_encode(ids: np.ndarray, list_starts: np.ndarray) -> np.ndarray:
    """Delta-encode many concatenated posting lists in one vectorized pass.

    ``ids`` is the concatenation of per-term doc-id lists, each strictly
    increasing; ``list_starts`` are the start offsets of each list (first
    element 0). The first id of every list stays absolute.
    """
    a = np.asarray(ids, dtype=np.int64)
    if a.size == 0:
        return np.empty(0, dtype=np.uint64)
    d = np.empty(a.shape, dtype=np.int64)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    starts = np.asarray(list_starts, dtype=np.int64)
    d[starts] = a[starts]
    if (d < 0).any():
        raise ValueError("ids must be non-negative and increasing within lists")
    return d.astype(np.uint64)


def segmented_delta_decode(deltas: np.ndarray, list_starts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`segmented_delta_encode` for concatenated lists."""
    d = np.asarray(deltas, dtype=np.uint64).astype(np.int64)
    if d.size == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.asarray(list_starts, dtype=np.int64)
    # A plain cumsum over-counts across list boundaries (each list's first
    # delta is absolute): value at position p of the list starting at s is
    # cumsum(d)[p] - cumsum(d)[s-1]. Subtract that carry per segment.
    out = np.cumsum(d)
    if starts.size > 1:
        carry = out[starts[1:] - 1]
        seg_len = np.diff(np.concatenate((starts, [d.size])))
        sub = np.repeat(np.concatenate(([0], carry)), seg_len)
        out = out - sub
    return out
