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


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, media_ref string, span_offset int, "
    "sample_rate int, n_samples bigint, duration_ms double, rms double"
)


def synthesize_wav(doc_id: int, offset: int) -> bytes:
    """Deterministic REAL RIFF/PCM16 WAV payload for (doc, span): mono,
    8 kHz, constant amplitude a = 1000 + (doc*31 + off*7) % 20000 over
    n = 64 + (doc + off) % 64 samples. Stands in for the object-store
    fetch; the bytes are a fully valid WAV file, so the decoder below is
    a real codec path, not a hash-based fake."""
    import struct as _s

    a = 1000 + (doc_id * 31 + offset * 7) % 20000
    n = 64 + (doc_id + offset) % 64
    rate, ch, bits = 8000, 1, 16
    data = np.full(n, a, dtype="<i2").tobytes()
    byte_rate = rate * ch * bits // 8
    block = ch * bits // 8
    hdr = (
        b"RIFF" + _s.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + _s.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, block, bits)
        + b"data" + _s.pack("<I", len(data))
    )
    return hdr + data


def decode_wav_batch(payloads: pd.Series) -> pd.DataFrame:
    """REAL WAV decode (pure stdlib/numpy): parse the RIFF container,
    walk chunks to fmt/data, read PCM16 samples, derive rate / sample
    count / duration / RMS. This is the production decode contract with
    an actual codec behind it — only the fetch is synthesized."""
    import struct as _s

    rows = []
    for b in payloads:
        if b is None or len(b) < 12 or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
            rows.append((None, None, None, None))
            continue
        buf = bytes(b)
        pos, rate, bits, ch, data = 12, None, None, None, None
        while pos + 8 <= len(buf):
            cid, clen = buf[pos : pos + 4], _s.unpack_from("<I", buf, pos + 4)[0]
            body = buf[pos + 8 : pos + 8 + clen]
            if cid == b"fmt ":
                _, ch, rate, _, _, bits = _s.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)
        if rate is None or data is None or bits != 16:
            rows.append((None, None, None, None))
            continue
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
        n = len(samples) // ch
        rms = float(np.sqrt(np.mean(samples * samples))) if n else 0.0
        rows.append((int(rate), int(n), n * 1000.0 / rate, rms))
    return pd.DataFrame(rows, columns=["sample_rate", "n_samples", "duration_ms", "rms"])


def extract_audio_features(docs: DataFrame) -> DataFrame:
    """Media spans -> synthesized WAV fetch -> REAL decode via
    mapInPandas. Same partitioning rationale as extract_media_features."""
    work = explode_media_spans(docs)
    work = work.repartition(F.pmod(F.xxhash64("doc_id"), F.lit(64)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pd.Series(
                [synthesize_wav(int(d), int(o)) for d, o in zip(pdf["doc_id"], pdf["span_offset"])]
            )
            feats = decode_wav_batch(payloads)
            yield pd.concat(
                [pdf[["doc_id", "media_ref", "span_offset"]].reset_index(drop=True), feats], axis=1
            )

    return work.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, media_ref string, span_offset int, "
    "width int, height int, maxval int, mean_luma double"
)


def synthesize_pgm(doc_id: int, offset: int) -> bytes:
    """Deterministic REAL PGM (P5) image payload: a constant-gray
    w x h 8-bit image — a fully valid binary PGM file, so the decoder
    below exercises a real image codec path (header grammar, raster
    read), not a hash fake."""
    w = 8 + (doc_id * 3 + offset) % 24
    h = 8 + (doc_id * 5 + offset) % 16
    g = (doc_id * 7 + offset * 11) % 256
    return f"P5\n{w} {h}\n255\n".encode() + bytes([g]) * (w * h)


def decode_pgm_batch(payloads: pd.Series) -> pd.DataFrame:
    """REAL PGM decode (pure stdlib/numpy): parse the P5 header
    (whitespace/comment grammar per the netpbm spec), read the 8-bit
    raster, derive width/height/maxval/mean luma."""
    rows = []
    for b in payloads:
        if b is None or bytes(b[:2]) != b"P5":
            rows.append((None, None, None, None))
            continue
        buf = bytes(b)
        pos, fields = 2, []
        while len(fields) < 3 and pos < len(buf):
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if buf[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(buf) and buf[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(buf[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        raster = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=pos)
        rows.append((w, h, maxval, float(raster.mean())))
    return pd.DataFrame(rows, columns=["width", "height", "maxval", "mean_luma"])


def resize_pgm_batch(payloads: pd.Series, max_side: int) -> pd.Series:
    """REAL image resize: decode the P5 raster, nearest-neighbor
    downsample so max(w, h) <= max_side (never upsamples), re-encode as
    PGM. Vectorized per image with numpy index grids — the decode ->
    transform -> encode contract of a production thumbnailing stage."""
    out = []
    for b in payloads:
        if b is None or bytes(b[:2]) != b"P5":
            out.append(None)
            continue
        meta = decode_pgm_batch(pd.Series([b])).iloc[0]
        w, h = int(meta.width), int(meta.height)
        buf = bytes(b)
        raster_off = len(buf) - w * h
        raster = np.frombuffer(buf, dtype=np.uint8, offset=raster_off).reshape(h, w)
        scale = max(w, h) / max_side
        if scale <= 1.0:
            out.append(buf)
            continue
        nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
        xs = (np.arange(nw) * (w / nw)).astype(np.int64)
        ys = (np.arange(nh) * (h / nh)).astype(np.int64)
        small = raster[np.ix_(ys, xs)]
        out.append(f"P5\n{nw} {nh}\n255\n".encode() + small.tobytes())
    return pd.Series(out)


def resize_images(docs: DataFrame, max_side: int = 16) -> DataFrame:
    """Media spans -> synthesized PGM fetch -> REAL resize -> features of
    the resized payload. -> (doc_id, media_ref, span_offset, width,
    height, maxval, mean_luma) for the THUMBNAIL."""
    work = explode_media_spans(docs)
    work = work.repartition(F.pmod(F.xxhash64("doc_id"), F.lit(64)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pd.Series(
                [synthesize_pgm(int(d), int(o)) for d, o in zip(pdf["doc_id"], pdf["span_offset"])]
            )
            resized = resize_pgm_batch(payloads, max_side)
            feats = decode_pgm_batch(resized)
            yield pd.concat(
                [pdf[["doc_id", "media_ref", "span_offset"]].reset_index(drop=True), feats], axis=1
            )

    return work.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def extract_image_features(docs: DataFrame) -> DataFrame:
    """Media spans -> synthesized PGM fetch -> REAL decode via
    mapInPandas (the image twin of extract_audio_features)."""
    work = explode_media_spans(docs)
    work = work.repartition(F.pmod(F.xxhash64("doc_id"), F.lit(64)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pd.Series(
                [synthesize_pgm(int(d), int(o)) for d, o in zip(pdf["doc_id"], pdf["span_offset"])]
            )
            feats = decode_pgm_batch(payloads)
            yield pd.concat(
                [pdf[["doc_id", "media_ref", "span_offset"]].reset_index(drop=True), feats], axis=1
            )

    return work.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


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
