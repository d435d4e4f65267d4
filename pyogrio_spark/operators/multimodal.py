"""Multimodal column plumbing: media as opaque binary + typed metadata.

Real in this module: span extraction, schemas, Arrow batch shapes,
partitioning, and UDF signatures. STUBBED (clearly marked): the actual
image/audio decode — the codec libraries are not in this container, so
``decode_image_batch`` produces a *deterministic fake* derived from the
payload bytes; swapping in PIL/ffmpeg later changes one function body
and nothing else. The schema/batching contract is tested for real.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, span_offset int, "
    "width int, height int, channels int, mean_luma double, sha256 string"
)


def explode_media_spans(docs: DataFrame) -> DataFrame:
    """One row per media span, order/offset preserved — the fan-out from
    the interleaved document model to per-asset work items."""
    s = F.explode(F.col("spans")).alias("span")
    return (
        docs.select("doc_id", s)
        .filter(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("span_offset"),
        )
    )


def fetch_media_stub(df: DataFrame, ref_col: str = "media_ref") -> DataFrame:
    """STUB for the object-store fetch: materializes a deterministic fake
    payload (sha256 of the ref, repeated) as the ``media_bytes`` binary
    column. A real deployment replaces this with a mapInPandas that
    reads from the distributed filesystem."""
    return df.withColumn(
        "media_bytes", F.to_binary(F.sha2(F.col(ref_col), 256), F.lit("hex"))
    )


def decode_image_batch(refs: pd.Series, payloads: pd.Series) -> pd.DataFrame:
    """STUB decode: deterministic fake metadata derived from payload
    bytes. Replace with PIL/turbojpeg for real decode; the signature
    (two Series in, DataFrame of typed features out, vectorized per
    Arrow batch) is the production contract.
    """
    rows = []
    for ref, b in zip(refs, payloads):
        if b is None:
            rows.append((None, None, None, None, None))
            continue
        h = hashlib.sha256(bytes(b)).digest()
        # fake-but-deterministic dimensions/luma from the content hash
        rows.append(
            (
                64 + h[0] % 192,
                64 + h[1] % 192,
                3,
                float(int.from_bytes(h[2:4], "big") % 25600) / 100.0,
                hashlib.sha256(bytes(b)).hexdigest(),
            )
        )
    return pd.DataFrame(rows, columns=["width", "height", "channels", "mean_luma", "sha256"])


def extract_media_features(docs: DataFrame) -> DataFrame:
    """Full pipeline: explode media spans -> fetch (stub) -> batch decode
    (stub) via mapInPandas. Partitioning note: media work is embarrassingly
    parallel; repartition by doc hash keeps batches balanced regardless of
    per-doc span counts."""
    work = fetch_media_stub(explode_media_spans(docs))
    work = work.repartition(F.pmod(F.xxhash64("doc_id"), F.lit(64)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = decode_image_batch(pdf["media_ref"], pdf["media_bytes"])
            out = pd.concat(
                [pdf[["doc_id", "media_ref", "span_offset"]].reset_index(drop=True), feats], axis=1
            )
            yield out

    return work.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """STUB video frame-sampling *plan*: emits (media_ref, frame_index)
    work items deterministically; the decode of each frame would go
    through ``decode_image_batch``. Keeps the planning math (which is
    real) separate from the codec (which is stubbed)."""
    return df.select(
        "doc_id",
        "media_ref",
        F.explode(F.sequence(F.lit(0), F.lit(max_frames - 1))).alias("frame_slot"),
    ).withColumn("frame_index", F.col("frame_slot") * every_n)
