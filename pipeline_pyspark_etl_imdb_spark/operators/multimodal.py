"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payload columns with a typed metadata
struct, exactly as a 100 TB training-data pipeline stores them: the bytes
travel through Spark untouched (no decode on the JVM), and all per-item
work — decode, feature extraction, resize, frame sampling — runs in
Arrow-batched ``mapInPandas`` stages so Python touches each batch once,
columnar, never row-at-a-time.

The actual codec step is STUBBED: the image/audio libraries are not in
this container, so ``decode_media`` dispatches to a deterministic fake
decoder (payload-derived header fields) and raises ``NotImplementedError``
for ``codec="real"``. Everything around the stub — the schema contract,
the UDF signatures, the Arrow batch shapes, partition preservation — is
real and tested (tests/test_multimodal.py).

The fixture tables carry no binary column, so ``media_from_documents``
derives one deterministically (utf-8 payload of the text plus a fake media
kind from the doc id) — the plumbing then runs on fixture-derived data
without synthesizing any new source table.

Scale notes: every operator here is map-only (zero shuffle); payload bytes
stay in the executor's Arrow buffers; metadata-only queries (media_stats)
prune the payload column at the parquet scan, so a catalog query over 100
TB of media reads kilobytes of footer + metadata pages, not the media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("n_bytes", LongType()),
                    StructField("content_md5", StringType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a media table from the documents fixture: payload = utf-8
    bytes of the text, kind assigned round-robin by doc id. Deterministic,
    so every engine derives the identical table."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % len(MEDIA_KINDS) + 1).cast("int"),
    )
    payload = F.encode(F.col("text"), "UTF-8")
    # per-item hashing + downstream Python batch work is CPU-bound; a
    # single-file fixture scan would serialize it all into one task
    docs = fan_out(docs)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only catalog view: never touches payload bytes, so the scan
    prunes the binary column entirely."""
    return media.select(
        "media_id",
        "kind",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
    )


# --- decode -----------------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: header fields derived from the
    payload's md5, so results are stable across engines and runs."""
    out = {"media_id": [], "kind": [], "width": [], "height": [], "n_frames": [], "n_bytes": []}
    for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
        digest = hashlib.md5(bytes(payload)).digest()
        out["media_id"].append(media_id)
        out["kind"].append(kind)
        out["width"].append(16 + digest[0] % 240)
        out["height"].append(16 + digest[1] % 240)
        out["n_frames"].append(1 if kind == "image" else 1 + digest[2] % 64)
        out["n_bytes"].append(len(payload))
    return pd.DataFrame(out)


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode payloads to per-item header metadata via mapInPandas.

    ``codec="real"`` is the integration point for PIL/ffmpeg/soundfile and
    raises NotImplementedError in this container; ``codec="fake"`` runs the
    deterministic stub through the identical Spark plumbing.
    """
    if codec == "real":
        raise NotImplementedError(
            "real codecs (PIL/ffmpeg/soundfile) are not available in this "
            "environment; use codec='fake' — the Spark plumbing is identical"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _fake_decode_batch(pdf)

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


# --- feature extraction -----------------------------------------------------

def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Fixed-width feature vector per item: the payload's byte histogram
    folded into ``dim`` buckets, L1-normalized. A deterministic stand-in
    for an embedding model with the production batch shape (Arrow in,
    fixed-dim array out).

    Emitted as array<double> so the exact rational k/total values
    hash-match an external oracle; a real embedding model would emit
    array<float> (FloatType) — the plumbing is type-parametric."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = bytes(payload)
                hist = [0] * dim
                for byte in buf:
                    hist[byte % dim] += 1
                total = max(len(buf), 1)
                ids.append(media_id)
                feats.append([h / total for h in hist])
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.select("media_id", "payload").mapInPandas(batches, schema=schema)


# --- resize -----------------------------------------------------------------

def resize_media(
    media: DataFrame, target_w: int = 64, target_h: int = 64, codec: str = "fake"
) -> DataFrame:
    """Resize image-kind payloads to target dimensions via mapInPandas.

    ``codec="real"`` is the PIL/opencv integration point (unavailable
    here); the fake codec emits a deterministic resized payload — the
    payload bytes resampled to exactly target_w*target_h bytes by striding
    (downsample) or repetition (upsample) — so output sizes, schema, and
    batch shapes match what a real resampler produces.
    """
    if codec == "real":
        raise NotImplementedError(
            "real image resampling (PIL/opencv) is not available in this "
            "environment; use codec='fake' — the Spark plumbing is identical"
        )
    if codec != "fake":
        raise ValueError(f"unknown codec {codec!r}")
    n_out = target_w * target_h
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("resized", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, resized = [], []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image":
                    continue
                buf = bytes(payload) or b"\x00"
                out = bytes(buf[(i * len(buf)) // n_out] for i in range(n_out))
                ids.append(media_id)
                resized.append(out)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [target_w] * len(ids),
                    "height": [target_h] * len(ids),
                    "resized": resized,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, schema=schema
    )


# --- frame sampling ---------------------------------------------------------

def sample_frames(media: DataFrame, frame_bytes: int = 64, every_k: int = 4) -> DataFrame:
    """Frame sampling for video-kind payloads: treat the payload as
    fixed-size frames and keep every k-th, emitting one row per kept frame
    (frame_idx, frame binary). The exploded-rows shape downstream encoders
    consume; map-only."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                buf = bytes(payload)
                n_frames = (len(buf) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_k):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(buf[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.select("media_id", "kind", "payload").mapInPandas(batches, schema=schema)
