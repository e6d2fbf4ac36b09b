"""End-to-end corpus curation: the composed filter → dedup pass a
pre-training data pipeline runs over raw crawled text.

One FUSED ``map_batches`` stage tokenizes each document ONCE and derives
every quality signal from that single token list — language ID, heuristic
quality score, Gopher-style repetition fractions, token count — then
applies the thresholds in place. Fusing matters at scale: the separate
signal operators (``language_id``, ``quality_scores``,
``repetition_scores``) each re-tokenize, so running them individually costs
~4 passes over 100 TB where this costs one. Their formulas are shared
verbatim (same stopword tables, same rounding), pinned by a differential
test against the individual operators and by the composed SQL oracle.

Survivors then flow into ``dedup_filter`` (hash-partition on content md5,
keep the min doc_id per group) — the only shuffle in the pipeline, and it
moves only the filtered survivors, never the raw corpus.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import ray.data

from distributed_text_search_ray.config import AnalyzerConfig
from distributed_text_search_ray.functions.tokenize import tokenizer_for
from distributed_text_search_ray.pipelines.dedup import dedup_filter
from distributed_text_search_ray.pipelines.textstats import (
    LANG_PRIORITY,
    _LANG_SETS,
    _STOPSET,
)
from distributed_text_search_ray.util import round_half_away


def curate_corpus(
    docs: ray.data.Dataset,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.1,
    min_tokens: int = 20,
    max_dup_trigram: float = 0.05,
    max_top_bigram: float = 0.2,
    analyzer: AnalyzerConfig | None = None,
) -> ray.data.Dataset:
    """Filtered + exact-deduped corpus as (doc_id, content).

    Keep a doc iff predicted language ∈ ``langs``, quality ≥
    ``min_quality``, token count ≥ ``min_tokens``, and both repetition
    fractions at or under their caps; then keep one representative (min
    doc_id) per exact content group. Thresholds compare against the
    6-dp-rounded signal values — identical to what the individual signal
    operators emit and what the SQL oracle computes, so boundary docs land
    on the same side in both engines.
    """
    return dedup_filter(
        docs.map_batches(
            make_curation_filter(
                langs, min_quality, min_tokens, max_dup_trigram, max_top_bigram, analyzer
            ),
            batch_format="pyarrow",
        )
    )


def make_curation_filter(
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.1,
    min_tokens: int = 20,
    max_dup_trigram: float = 0.05,
    max_top_bigram: float = 0.2,
    analyzer: AnalyzerConfig | None = None,
):
    """The fused per-batch quality filter of :func:`curate_corpus` as a
    standalone batch callable — shard-local (no dedup), so it composes with
    the resumable per-shard sink (``sources.sink.write_corpus_resumable``)
    as well as with ``map_batches``."""
    lang_set = frozenset(langs)

    def f(batch: pa.Table) -> pa.Table:
        tk = tokenizer_for(analyzer)
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("content").to_pylist()
        keep_ids, keep_texts = [], []
        for d, text in zip(ids, texts):
            toks = tk.tokens(text)
            n = len(toks)
            if n < min_tokens:
                continue
            best_lang, best = "und", 0
            for lang in LANG_PRIORITY:
                s = sum(1 for t in toks if t in _LANG_SETS[lang])
                if s > best:
                    best, best_lang = s, lang
            if best_lang not in lang_set:
                continue
            sw = sum(1 for t in toks if t in _STOPSET) / n
            if round_half_away(sw * 0.5 + min(n, 200) / 400.0, 6) < min_quality:
                continue
            if n >= 3:
                tgs = list(zip(toks, toks[1:], toks[2:]))
                dup3 = round_half_away(1.0 - len(set(tgs)) / len(tgs), 6)
                if dup3 > max_dup_trigram:
                    continue
            if n >= 2:
                bgs = Counter(zip(toks, toks[1:]))
                top2 = round_half_away(max(bgs.values()) / (n - 1), 6)
                if top2 > max_top_bigram:
                    continue
            keep_ids.append(d)
            keep_texts.append(text)
        return pa.table(
            {
                "doc_id": pa.array(keep_ids, type=pa.int64()),
                "content": pa.array(keep_texts, type=pa.string()),
            }
        )

    return f
