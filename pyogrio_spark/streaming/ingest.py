"""Continuous corpus-ingest pipeline: the end-to-end composition a
training-data platform runs forever.

    documents stream -> exact dedup (bounded state) -> chunk + pack
    (stateless map) -> transactional snapshot sink

Each micro-batch commits through ``write_table`` inside
``foreachBatch``, so the corpus table only ever exposes whole
micro-batches (the manifest swap is atomic); combined with the stream
checkpoint, a crashed pipeline resumes from the last completed trigger
without losing or re-exposing partial data. Chunking is stateless, so
it adds zero streaming state; dedup state is bounded by
(arrival rate x watermark) — see ``dedup_events_stream``.

The documents stream carries no event time, so dedup here keys on
content hash per micro-batch + the cross-batch suppression the sink's
append snapshots make cheap to audit (exact cross-batch dedup of an
unbounded keyless stream would need unbounded state by definition —
the horizon-bounded form is the scalable contract, same as the events
stream's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def ingest_corpus_stream(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    chunk_tokens: int = 32,
    overlap_tokens: int = 8,
    budget_tokens: int = 128,
    scrub: bool = False,
):
    """Start the ingest StreamingQuery writing chunked/packed rows to a
    committed table at ``table_path``. Returns the StreamingQuery.

    Per micro-batch: optionally scrub (normalize + PII-redact — the
    zero-shuffle map from functions/scrub.py, so it adds NO streaming
    state and no extra exchange), drop exact content duplicates (md5 of
    normalized text — one shuffle over the batch, not the corpus),
    chunk + pack (zero-shuffle map), append-commit one snapshot. The
    batch id is recorded in the snapshot properties so replayed
    triggers are detectable downstream.
    """
    from pyogrio_spark.functions.scrub import normalize_text, redact_pii
    from pyogrio_spark.io.writer import write_table
    from pyogrio_spark.operators.chunking import chunk_documents, pack_chunks

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if scrub:
            batch_df = batch_df.withColumn(
                "text", redact_pii(normalize_text(F.col("text")))
            )
        deduped = (
            batch_df.withColumn(
                "_h", F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
            )
            .dropDuplicates(["_h"])
            .drop("_h")
        )
        chunks = pack_chunks(
            chunk_documents(deduped, chunk_tokens, overlap_tokens),
            budget_tokens,
            chunk_tokens,
        )
        write_table(
            chunks, table_path, mode="append", properties={"last_batch_id": int(batch_id)}
        )

    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
