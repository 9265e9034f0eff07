"""Multimodal column plumbing: decode / feature-extract / frame-sample.

Images/audio/video ride as opaque `binary` columns with typed metadata
structs.  The real codecs (PIL/ffmpeg/librosa) are NOT in this
container, so the decode step is STUBBED behind `WEBEXTRACT_REAL_MEDIA`
— the deterministic fake derives metadata purely from the payload bytes
so the Spark-side plumbing (schema, Arrow batch shape, mapInPandas
signature, partitioning) is real and fully tested, and the fake decode
is SQL-expressible for the DuckDB oracle.

Batch shape: mapInPandas receives pandas DataFrames of (doc_id: int64,
media: bytes); payload bytes are examined per element with vectorized
pandas ops where possible.  At 100 TB the media column dominates row
size → the caller repartitions by payload-size tier exactly like the
HTML path (pipeline.extracted_df).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

REAL_MEDIA = os.environ.get("WEBEXTRACT_REAL_MEDIA", "") == "1"

MEDIA_META_SCHEMA = ("doc_id bigint, n_bytes bigint, fmt string, "
                     "width int, height int, n_frames int")

_FMTS = ("jpeg", "png", "webp")


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic stand-in for image/video header decode: metadata is
    a pure function of payload length (so the oracle can recompute it
    from octet_length).  Real decode would parse magic bytes + headers."""
    n = len(payload)
    return {"n_bytes": n, "fmt": _FMTS[n % 3],
            "width": 16 + n % 512, "height": 16 + (n * 7) % 512,
            "n_frames": 1 + n % 24}


def decode_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, media:binary) → metadata rows."""
    if REAL_MEDIA:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg — not in this container")
    for pdf in batches:
        metas = [fake_decode_meta(m if m is not None else b"")
                 for m in pdf["media"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def media_meta(df: DataFrame) -> DataFrame:
    """df(doc_id, media:binary) → (doc_id, n_bytes, fmt, width, height,
    n_frames).  Narrow mapInPandas pass; Arrow both directions."""
    return df.select("doc_id", "media").mapInPandas(
        decode_meta_batches, MEDIA_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx int, frame_off bigint"


def frame_sample_batches(stride: int):
    """UDTF-style 1→N frame sampler: emit every `stride`-th frame offset.
    The fake treats the payload as fixed-size 4 KiB frames; a real
    decoder would emit keyframe byte offsets."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if REAL_MEDIA:
            raise NotImplementedError("real frame decode not available")
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for did, m in zip(pdf["doc_id"], pdf["media"]):
                n = len(m) if m is not None else 0
                n_frames = 1 + n % 24
                for j in range(0, n_frames, stride):
                    ids.append(did)
                    idxs.append(j)
                    offs.append(j * 4096)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_off": offs})

    return fn


def frame_sample(df: DataFrame, stride: int = 4) -> DataFrame:
    return df.select("doc_id", "media").mapInPandas(
        frame_sample_batches(stride), FRAME_SAMPLE_SCHEMA)


def with_fake_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary `media` column derived from text
    (stands in for a crawled image payload; ASCII text → n_bytes ==
    length(text), which the oracle uses)."""
    return docs.withColumn("media", F.encode(F.col("text"), "utf-8"))
