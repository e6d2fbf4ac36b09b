"""Posting-segment format: build, write, read.

One segment per term-hash partition. On disk (inside ``part=NNNNN/``):

- ``terms.parquet`` — the partition's sorted term dictionary. Columns:
  ``term`` (sorted asc), ``df`` (local document frequency = list length),
  ``doc_off``/``doc_nbytes``, ``tf_off``/``tf_nbytes``, ``dl_off``/``dl_nbytes``
  (byte slices into the three streams), ``block_max`` (list<float64>,
  per-block upper bound on the BM25 score — block-max WAND metadata) and
  ``block_last`` (list<int64>, last doc_id per block, for skipping).
- ``docs.bin`` — delta + varbyte doc ids (delta within each term's list,
  first id absolute).
- ``tfs.bin`` / ``dls.bin`` — varbyte term frequencies / document lengths.
  Embedding dl per posting trades space for never needing a doc->dl lookup
  table at query time (a doc-length table does not broadcast at 10^12-doc
  scale).
- ``MANIFEST.json`` — lineage (see state.manifest).

All encoding is vectorized: one ``varbyte_encode`` call per stream for the
whole partition, with per-term byte offsets derived from the width cumsum.
Block-max scores use the *local* df; local idf >= global idf for salted terms
(df_local <= df_global), so stored bounds remain valid upper bounds when the
executor scores with exact global df.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from distributed_text_search_ray.config import IndexConfig
from distributed_text_search_ray.functions import bm25
from distributed_text_search_ray.functions.codec import (
    segmented_delta_encode,
    varbyte_decode,
    varbyte_encode,
)

TERMS_FILE = "terms.parquet"
STREAMS = ("docs.bin", "tfs.bin", "dls.bin")


def build_segment_tables(
    term_codes: np.ndarray,
    term_strings,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    N: int,
    avgdl: float,
    cfg: IndexConfig,
) -> tuple[pa.Table, bytes, bytes, bytes, dict]:
    """Encode one partition's pairs (already sorted by (term, doc_id)) into
    (terms table, docs stream, tfs stream, dls stream, stats).

    ``term_codes``: int codes per pair row, non-decreasing (dictionary codes
    of the sorted term column); ``term_strings``: the dictionary — strings
    for each distinct code, in code order. Keeping the hot path on int codes
    avoids materializing millions of Python strings per partition.
    """
    n = len(term_codes)
    if n == 0:
        empty = pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "df": pa.array([], type=pa.int64()),
                "cf": pa.array([], type=pa.int64()),
                "doc_off": pa.array([], type=pa.int64()),
                "doc_nbytes": pa.array([], type=pa.int64()),
                "tf_off": pa.array([], type=pa.int64()),
                "tf_nbytes": pa.array([], type=pa.int64()),
                "dl_off": pa.array([], type=pa.int64()),
                "dl_nbytes": pa.array([], type=pa.int64()),
                "block_max": pa.array([], type=pa.list_(pa.float64())),
                "block_last": pa.array([], type=pa.list_(pa.int64())),
            }
        )
        return empty, b"", b"", b"", {
            "n_terms": 0, "n_postings": 0, "sum_tf": 0, "max_doc_id": -1,
        }

    # term boundaries (input sorted by term, doc_id)
    codes = np.asarray(term_codes)
    is_start = np.empty(n, dtype=bool)
    is_start[0] = True
    is_start[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(is_start)
    df = np.diff(np.concatenate((starts, [n])))
    uniq_terms = [term_strings[c] for c in codes[starts]]

    deltas = segmented_delta_encode(doc_ids, starts)
    doc_stream, doc_w = varbyte_encode(deltas)
    tf_stream, tf_w = varbyte_encode(tfs.astype(np.uint64))
    dl_stream, dl_w = varbyte_encode(dls.astype(np.uint64))

    def offsets(widths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ends = np.cumsum(widths)
        posting_starts = np.concatenate(([0], ends[:-1]))
        term_off = posting_starts[starts]
        term_end = ends[np.concatenate((starts[1:] - 1, [n - 1]))]
        return term_off, term_end - term_off

    doc_off, doc_nb = offsets(doc_w)
    tf_off, tf_nb = offsets(tf_w)
    dl_off, dl_nb = offsets(dl_w)

    # block-max metadata: blocks of cfg.block_size postings within each term
    B = cfg.block_size
    n_blocks = (df + B - 1) // B
    block_offsets = np.concatenate(([0], np.cumsum(n_blocks)))
    block_term = np.repeat(np.arange(len(starts)), n_blocks)
    within = np.arange(block_offsets[-1], dtype=np.int64) - block_offsets[block_term]
    block_starts = starts[block_term] + within * B
    block_ends = np.minimum(block_starts + B, np.repeat(starts + df, n_blocks))
    # per-posting local score: idf(local df) * tf saturation. idf uses
    # math.log per term (not np.log, which can differ by 1 ulp) so stored
    # block maxima are bit-identical upper bounds of query-time scores.
    import math

    tfpart = bm25.tf_part(tfs, dls, avgdl, cfg.bm25_k1, cfg.bm25_b)
    idf_per_term = np.fromiter(
        (math.log(1.0 + (N - int(d) + 0.5) / (int(d) + 0.5)) for d in df),
        dtype=np.float64,
        count=len(df),
    )
    scores = np.repeat(idf_per_term, df) * tfpart
    block_max = np.maximum.reduceat(scores, block_starts) if len(block_starts) else np.empty(0)
    block_last = doc_ids[block_ends - 1] if len(block_ends) else np.empty(0, np.int64)
    block_offsets = block_offsets.astype(np.int32)

    cf = np.add.reduceat(tfs, starts)
    terms_table = pa.table(
        {
            "term": pa.array(uniq_terms, type=pa.string()),
            "df": pa.array(df, type=pa.int64()),
            "cf": pa.array(cf, type=pa.int64()),
            "doc_off": pa.array(doc_off, type=pa.int64()),
            "doc_nbytes": pa.array(doc_nb, type=pa.int64()),
            "tf_off": pa.array(tf_off, type=pa.int64()),
            "tf_nbytes": pa.array(tf_nb, type=pa.int64()),
            "dl_off": pa.array(dl_off, type=pa.int64()),
            "dl_nbytes": pa.array(dl_nb, type=pa.int64()),
            "block_max": pa.ListArray.from_arrays(
                pa.array(block_offsets), pa.array(block_max, type=pa.float64())
            ),
            "block_last": pa.ListArray.from_arrays(
                pa.array(block_offsets), pa.array(block_last, type=pa.int64())
            ),
        }
    )
    stats = {
        "n_terms": int(len(uniq_terms)),
        "n_postings": int(n),
        "sum_tf": int(tfs.sum()),
        "max_doc_id": int(doc_ids.max()),
    }
    return terms_table, doc_stream.tobytes(), tf_stream.tobytes(), dl_stream.tobytes(), stats


def write_segment(
    seg_dir: str,
    terms_table: pa.Table,
    doc_stream: bytes,
    tf_stream: bytes,
    dl_stream: bytes,
) -> dict:
    """Write segment files into ``seg_dir`` (caller handles atomicity).

    Returns stream checksums for the manifest.
    """
    pq.write_table(terms_table, os.path.join(seg_dir, TERMS_FILE))
    checks = {}
    for name, data in zip(STREAMS, (doc_stream, tf_stream, dl_stream)):
        with open(os.path.join(seg_dir, name), "wb") as f:
            f.write(data)
        checks[name] = hashlib.md5(data).hexdigest()
    return checks


class SegmentReader:
    """Read-side view of one partition segment.

    Loads the term dictionary once; posting streams are memory-mapped and
    decoded per requested term (only touched byte ranges are paged in).
    """

    def __init__(self, seg_dir: str):
        self.seg_dir = seg_dir
        t = pq.read_table(os.path.join(seg_dir, TERMS_FILE))
        self._terms = t
        self._lookup = {term: i for i, term in enumerate(t.column("term").to_pylist())}
        self._streams = {}
        for name in STREAMS:
            p = os.path.join(seg_dir, name)
            self._streams[name] = (
                np.memmap(p, dtype=np.uint8, mode="r")
                if os.path.getsize(p)
                else np.empty(0, dtype=np.uint8)
            )

    @property
    def terms_table(self) -> pa.Table:
        return self._terms

    def term_row(self, term: str) -> int | None:
        return self._lookup.get(term)

    def local_df(self, term: str) -> int:
        i = self._lookup.get(term)
        return int(self._terms.column("df")[i].as_py()) if i is not None else 0

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """(doc_ids, tfs, dls) for a term, or None if absent."""
        i = self._lookup.get(term)
        if i is None:
            return None
        row = {c: self._terms.column(c)[i].as_py() for c in (
            "df", "doc_off", "doc_nbytes", "tf_off", "tf_nbytes", "dl_off", "dl_nbytes")}
        df = row["df"]
        docs = varbyte_decode(
            self._streams["docs.bin"][row["doc_off"] : row["doc_off"] + row["doc_nbytes"]],
            count=df,
        )
        doc_ids = np.cumsum(docs.astype(np.int64))
        tfs = varbyte_decode(
            self._streams["tfs.bin"][row["tf_off"] : row["tf_off"] + row["tf_nbytes"]], count=df
        ).astype(np.int64)
        dls = varbyte_decode(
            self._streams["dls.bin"][row["dl_off"] : row["dl_off"] + row["dl_nbytes"]], count=df
        ).astype(np.int64)
        return doc_ids, tfs, dls

    def block_meta(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(block_max_scores, block_last_docids) for WAND."""
        i = self._lookup.get(term)
        if i is None:
            return None
        bm = np.asarray(self._terms.column("block_max")[i].as_py(), dtype=np.float64)
        bl = np.asarray(self._terms.column("block_last")[i].as_py(), dtype=np.int64)
        return bm, bl
