"""Multimodal columns: opaque binary payloads with typed metadata.

Images/audio/video travel as ``binary`` columns plus metadata columns
(modality, format, width/height/duration). All Ray-side plumbing — schemas,
actor-pool stage shape, batch sizing for large rows, output layout — is real
and tested; the actual codec work is STUBBED (this container has no
image/audio libraries): ``decode(...)`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded by the
payload's hash) produces stable pseudo-pixels so downstream stages and tests
have real data to chew on.

Batch-size guidance encoded here: binary rows are large, so the decode stage
defaults to small ``batch_size`` (64) and a bounded actor pool — the object
store spills rather than a worker OOMing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from distributed_text_search_ray.util import resolve_concurrency

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("modality", pa.string()),   # image | audio | video
        ("format", pa.string()),     # png | wav | mp4 | ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthetic_media(n: int = 64, seed: int = 0) -> pa.Table:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    rng = np.random.default_rng(seed)
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8)
        rows["media_id"].append(i)
        rows["modality"].append(modality)
        rows["format"].append({"image": "png", "audio": "wav", "video": "mp4"}[modality])
        rows["payload"].append(payload.tobytes())
        rows["width"].append(int(rng.integers(16, 256)) if modality != "audio" else 0)
        rows["height"].append(int(rng.integers(16, 256)) if modality != "audio" else 0)
        rows["duration_ms"].append(int(rng.integers(100, 10_000)) if modality != "image" else 0)
    return pa.table({f.name: pa.array(rows[f.name], type=f.type) for f in MEDIA_SCHEMA})


class MediaDecoder:
    """Actor-pool decode stage (setup once per actor, work per batch).

    Real decoding is NOT implemented in this environment; with ``fake=True``
    a deterministic stand-in derives an 8x8 luma thumbnail from the payload
    bytes (stable across runs/processes — sha256-seeded).
    """

    def __init__(self, fake: bool = False):
        self.fake = fake
        # real implementation would load PIL / libav here, once per actor

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decoding requires image/audio libraries not present in "
                "this container; construct MediaDecoder(fake=True) for the "
                "deterministic stand-in"
            )
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(8, 8), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs = [self._decode_one(p) for p in batch.column("payload").to_pylist()]
        flat = pa.array([t.flatten().tolist() for t in thumbs], type=pa.list_(pa.uint8()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "modality": batch.column("modality"),
                "thumb8x8": flat,
            }
        )


class MediaFeatureExtractor:
    """Actor-pool feature stage: 64-d float32 embedding per media item.

    Fake-deterministic (derived from the decoded thumbnail) — the plumbing a
    real model-inference stage needs (model load once in __init__, batched
    __call__, list<float> output) without the model."""

    def __init__(self):
        self.dim = 64

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for thumb in batch.column("thumb8x8").to_pylist():
            v = np.asarray(thumb, dtype=np.float32)
            v = (v - v.mean()) / (v.std() + 1e-6)
            feats.append(v.tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "embedding": pa.array(feats, type=pa.list_(pa.float32())),
            }
        )


def decode_and_featurize(
    media: ray.data.Dataset,
    fake: bool = True,
    batch_size: int = 64,
    concurrency=None,
) -> ray.data.Dataset:
    """media table -> (media_id, embedding). Small batches: binary rows are
    large, so batch x concurrency must fit worker heaps."""
    decoded = media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )
    return decoded.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=resolve_concurrency(concurrency),
    )


def frame_sample_stub(media: ray.data.Dataset, every_ms: int = 1000) -> ray.data.Dataset:
    """Video frame sampling: emits (media_id, frame_idx, ts_ms) rows from the
    metadata only (real frame extraction is the stubbed decode)."""

    def sample(batch: pa.Table) -> pa.Table:
        out_id, out_idx, out_ts = [], [], []
        for mid, modality, dur in zip(
            batch.column("media_id").to_pylist(),
            batch.column("modality").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if modality != "video":
                continue
            for i, ts in enumerate(range(0, int(dur), every_ms)):
                out_id.append(mid)
                out_idx.append(i)
                out_ts.append(ts)
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "ts_ms": pa.array(out_ts, type=pa.int32()),
            }
        )

    return media.map_batches(sample, batch_format="pyarrow")
