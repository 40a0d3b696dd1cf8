"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension).

The Spark-side plumbing is real and tested — schema (schemas.MEDIA_SCHEMA),
Arrow-batched mapInPandas pipelines, partition sizing — while the actual
codec work is stubbed: this container has no image/audio libraries, so
decode is either a clearly-marked NotImplementedError (strict mode) or a
deterministic fake (md5-derived pixels/samples) that keeps batch shapes,
dtypes and row alignment honest.

Scale notes: binary payloads ride in their own column so column pruning
drops them unless a stage truly needs bytes; mapInPandas streams Arrow
record batches (no per-row Python); `spark.sql.files.maxPartitionBytes`
bounds task memory no matter how large the corpus.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_OUTPUT_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes long, feat array<float>"
)

FRAME_OUTPUT_SCHEMA = "media_id long, frame_idx int, frame_md5 string"

FEATURE_DIM = 16


def _fake_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real feature extractor: md5-seeded
    pseudo-features in [0, 1). Replace with a real model UDF in prod."""
    if payload is None:
        return [0.0] * dim
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """'Decode' each payload: dims from metadata, features from bytes.

    strict=True raises NotImplementedError inside the UDF — the honest
    posture when a real codec is required; strict=False produces the
    deterministic fake so pipelines downstream can be built and tested.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; use strict=False for the "
                    "deterministic fake"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [m["width"] if m is not None else None for m in pdf["meta"]],
                    "height": [m["height"] if m is not None else None for m in pdf["meta"]],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feat": [_fake_features(p) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(_decode, schema=DECODE_OUTPUT_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits 1..max_frames rows
    per video (row explosion inside Arrow batches). Frame 'content' is a
    deterministic md5 of (payload, frame_idx) — the real decoder slots in
    here unchanged."""

    import numpy as np

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[(pdf["kind"] == "video") & pdf["payload"].notna()]
            if vids.empty:
                yield pd.DataFrame(columns=["media_id", "frame_idx", "frame_md5"])
                continue
            dur = vids["meta"].map(lambda m: (m or {}).get("duration_ms") or 0)
            n = np.minimum(
                max_frames, np.maximum(1, dur.to_numpy() // (every_n * 1000))
            ).astype(int)
            # vectorized row explosion: repeat each video row n_i times
            rep = vids.loc[vids.index.repeat(n)]
            frame_idx = np.concatenate([np.arange(c) for c in n])
            # the md5 stands in for the per-frame decoder — inherently
            # per-item work; everything around it is vectorized
            md5s = [
                hashlib.md5(bytes(p) + int(i).to_bytes(4, "big")).hexdigest()
                for p, i in zip(rep["payload"], frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": rep["media_id"].to_numpy(),
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_md5": md5s,
                }
            )

    return media.mapInPandas(_frames, schema=FRAME_OUTPUT_SCHEMA)


def media_feature_topk(
    decoded: DataFrame,
    k: int = 3,
    query_filter=None,
    allow_full_scan: bool = False,
) -> DataFrame:
    """Downstream consumer of decoded features: nearest media by fake-
    feature cosine — proves the array<float> column composes with the
    similarity kernels. Forwards brute_force_topk's N² guard: pass a
    query_filter, or allow_full_scan=True for a deliberately small set."""
    from hypermap_etl_spark.operators.similarity import brute_force_topk

    emb = decoded.select(F.col("media_id").alias("vec_id"), F.col("feat").alias("embedding"))
    return brute_force_topk(emb, k=k, query_filter=query_filter, allow_full_scan=allow_full_scan)
