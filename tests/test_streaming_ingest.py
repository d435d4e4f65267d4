"""End-to-end streaming corpus ingest (streaming/ingest.py): stream ->
per-batch dedup -> chunk/pack -> transactional snapshot sink, under a
real StreamingQuery with checkpointed resume."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyogrio_spark.io.writer import current_snapshot, read_committed, write_table
from pyogrio_spark.operators.chunking import chunk_documents, pack_chunks
from pyogrio_spark.streaming.ingest import ingest_corpus_stream, read_documents_stream

SF = "/root/testdata/sf0.001"


def _mk_source(spark, tmp_path):
    """Two stream files; the second re-delivers 100 docs (dup content)."""
    src = str(tmp_path / "docs_src")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.coalesce(1).write.parquet(src)
    docs.limit(100).coalesce(1).write.mode("append").parquet(src)
    return src, docs


def test_ingest_corpus_stream_end_to_end(spark, tmp_path):
    src, docs = _mk_source(spark, tmp_path)
    tbl = str(tmp_path / "corpus_table")
    ckpt = str(tmp_path / "ckpt")

    q = ingest_corpus_stream(read_documents_stream(spark, src), tbl, ckpt)
    q.awaitTermination(180)

    got = read_committed(spark, tbl)
    # batch reference: dedup is per micro-batch, and each parquet file is
    # one trigger here, so the expected table = chunks of file1's unique
    # docs + chunks of file2's unique docs (file2 is all re-deliveries of
    # file1 rows, but cross-batch dedup is horizon-bounded by design and
    # here each batch dedups within itself only)
    exp_full = pack_chunks(chunk_documents(docs), 128, 32)
    exp_dup = pack_chunks(chunk_documents(docs.limit(100)), 128, 32)
    assert got.count() == exp_full.count() + exp_dup.count()

    # chunk content parity for the first batch's docs
    key = ["doc_id", "chunk_id"]
    g = (
        got.join(docs.limit(100).select("doc_id"), "doc_id", "left_anti")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    e = (
        exp_full.join(docs.limit(100).select("doc_id"), "doc_id", "left_anti")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(g[["doc_id", "chunk_id", "chunk_text", "n_tokens", "pack_id"]],
                                  e[["doc_id", "chunk_id", "chunk_text", "n_tokens", "pack_id"]])

    # snapshot accounting: one append per non-empty micro-batch,
    # batch id recorded
    snap = current_snapshot(tbl)
    assert snap["operation"] == "append"
    from pyogrio_spark.io.writer import _read_manifest

    man = _read_manifest(tbl)
    assert len(man["snapshots"]) == 2
    assert man["properties"]["last_batch_id"] == 1

    # checkpointed resume: restarting over the same source is a no-op
    q2 = ingest_corpus_stream(read_documents_stream(spark, src), tbl, ckpt)
    q2.awaitTermination(120)
    assert len(_read_manifest(tbl)["snapshots"]) == 2  # nothing re-ingested


def test_ingest_batch_dedup_suppresses_within_batch(spark, tmp_path):
    """Duplicate content arriving in the SAME micro-batch collapses."""
    src = str(tmp_path / "dup_src")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    docs.union(docs).coalesce(1).write.parquet(src)  # one file = one batch
    tbl = str(tmp_path / "dup_table")

    q = ingest_corpus_stream(
        read_documents_stream(spark, src), tbl, str(tmp_path / "dup_ckpt")
    )
    q.awaitTermination(120)
    got = read_committed(spark, tbl)
    exp = pack_chunks(chunk_documents(docs), 128, 32)
    assert got.count() == exp.count()
    assert got.select("doc_id").distinct().count() == 50


def test_ingest_scrub_stage_redacts_before_commit(spark, tmp_path):
    """scrub=True: committed chunks contain redaction tokens, never the
    planted PII; the stage is batch-stateless (same checkpoint contract)."""
    from pyspark.sql import functions as F

    from pyogrio_spark.io.writer import read_committed

    src = str(tmp_path / "scrub_src")
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(30).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach admin@leak.example.com or 415-555-0000 at 10.1.2.3"),
        ),
    )
    docs.coalesce(1).write.parquet(src)
    tbl = str(tmp_path / "scrub_tbl")
    ckpt = str(tmp_path / "scrub_ckpt")
    q = ingest_corpus_stream(read_documents_stream(spark, src), tbl, ckpt, scrub=True)
    q.awaitTermination(120)
    chunks = read_committed(spark, tbl)
    leaked = chunks.filter(
        F.col("chunk_text").contains("admin@leak.example.com")
        | F.col("chunk_text").contains("415-555-0000")
        | F.col("chunk_text").contains("10.1.2.3")
    ).count()
    assert leaked == 0
    assert chunks.filter(F.col("chunk_text").contains("<EMAIL>")).count() > 0
