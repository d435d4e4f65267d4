"""Span-sequence transform tests (functions/spans.py): kind projection
with offset compaction over the interleaved data model. Value parity of
the registry entry is covered by test_entry_oracle.py; here: structural
invariants and plan shape."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyogrio_spark.functions.spans import filter_spans_kind, media_ref_table, strip_media_spans

SPAN_SCHEMA = (
    "doc_id bigint, spans array<struct<kind string, text string, media_ref string, offset int>>"
)


@pytest.fixture(scope="module")
def interleaved(spark):
    rows = [
        (1, [("text", "a b", None, 0), ("media", None, "media://1/1", 1), ("text", "c", None, 2)]),
        (2, [("media", None, "media://2/0", 0), ("media", None, "media://2/1", 1)]),
        (3, [("text", "only text", None, 0)]),
        (4, []),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _spans(df, doc_id):
    row = df.filter(F.col("doc_id") == doc_id).collect()[0]
    return [tuple(s) for s in row["spans"]]


class TestStripMedia:
    def test_offsets_recompact_order_preserved(self, interleaved):
        out = strip_media_spans(interleaved)
        assert _spans(out, 1) == [("text", "a b", None, 0, 0), ("text", "c", None, 1, 2)]

    def test_all_media_doc_becomes_empty_not_dropped(self, interleaved):
        out = strip_media_spans(interleaved)
        assert _spans(out, 2) == []
        assert out.count() == 4  # doc rows survive; the sequence is empty

    def test_media_projection(self, interleaved):
        refs = media_ref_table(interleaved).orderBy("doc_id", "offset").collect()
        assert [(r["doc_id"], r["media_ref"], r["offset"], r["orig_offset"]) for r in refs] == [
            (1, "media://1/1", 0, 1),
            (2, "media://2/0", 0, 0),
            (2, "media://2/1", 1, 1),
        ]

    def test_pure_map_no_shuffle(self, interleaved):
        plan = strip_media_spans(interleaved)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan

    def test_filter_then_strip_is_idempotent(self, interleaved):
        once = strip_media_spans(interleaved)
        # a second strip must keep the compacted offsets fixed (modulo
        # orig_offset now pointing at the compacted sequence)
        twice = once.withColumn(
            "spans", filter_spans_kind(F.col("spans"), "text")
        )
        kept = twice.filter(F.col("doc_id") == 1).collect()[0]["spans"]
        assert [(s["offset"], s["text"]) for s in kept] == [(0, "a b"), (1, "c")]
