"""Document chunking + packing (operators/chunking.py): window math,
reconstruction invariant, pack capacity guarantee, and the zero-shuffle
plan shape that makes it a pure map stage at 100 TB."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyogrio_spark.operators.chunking import chunk_documents, pack_chunks

C, O = 8, 3  # chunk / overlap; stride 5


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"t{i}" for i in range(23))),  # 23 toks -> 4 chunks
        (1, " ".join(f"u{i}" for i in range(8))),   # exactly one window
        (2, " ".join(f"v{i}" for i in range(5))),   # shorter than a window
        (3, "solo"),                                 # single token
        (4, " ".join(f"w{i}" for i in range(13))),  # 13 -> 2 chunks (tail short)
    ]
    return spark.createDataFrame(rows, schema="doc_id bigint, text string")


def test_chunk_grid(spark, docs):
    out = chunk_documents(docs, C, O).toPandas().sort_values(["doc_id", "chunk_id"])
    counts = out.groupby("doc_id").size().to_dict()
    assert counts == {0: 4, 1: 1, 2: 1, 3: 1, 4: 2}
    d0 = out[out.doc_id == 0]
    assert list(d0.n_tokens) == [8, 8, 8, 8]  # 23: windows at 0,5,10,15
    assert d0.chunk_text.iloc[1].split(" ") == [f"t{i}" for i in range(5, 13)]
    d4 = out[out.doc_id == 4]
    assert list(d4.n_tokens) == [8, 8]  # 13: windows at 0,5 (tail exactly fills)
    assert out[out.doc_id == 3].chunk_text.iloc[0] == "solo"


def test_reconstruction_invariant(spark, docs):
    """Dropping each chunk's overlap prefix (except chunk 0) and
    concatenating reconstructs the original text exactly — no token is
    lost or duplicated by the grid."""
    out = chunk_documents(docs, C, O).toPandas().sort_values(["doc_id", "chunk_id"])
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, grp in out.groupby("doc_id"):
        toks = []
        for _, row in grp.iterrows():
            ct = row.chunk_text.split(" ")
            # chunk k>0 starts O tokens before the covered frontier (the
            # grid guarantees every chunk, incl. the tail, is > O long)
            toks.extend(ct if row.chunk_id == 0 else ct[O:])
        assert " ".join(toks) == orig[doc_id], doc_id


def test_pack_capacity(spark, docs):
    out = pack_chunks(chunk_documents(docs, C, O), budget_tokens=17, chunk_tokens=C)
    pdf = out.toPandas()
    sums = pdf.groupby(["doc_id", "pack_id"]).n_tokens.sum()
    assert (sums <= 17).all()
    # doc 0 has 4 chunks, 2 per pack (17 // 8 = 2)
    assert pdf[pdf.doc_id == 0].pack_id.tolist().count(0) == 2


def test_chunking_validation(spark, docs):
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(docs, 8, 8)
    with pytest.raises(ValueError, match="budget_tokens"):
        pack_chunks(chunk_documents(docs, C, O), budget_tokens=4, chunk_tokens=8)


def test_chunking_plan_is_shuffle_free(spark, docs):
    """The whole chunk+pack pipeline must plan as a map stage: no
    Exchange, no Python — the property that makes it run at 100 TB as
    fast as the scan."""
    out = pack_chunks(chunk_documents(docs, C, O), budget_tokens=32, chunk_tokens=C)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_chunking_property_reconstruction(spark):
    """Property: for random texts and random (chunk, overlap) grids the
    reconstruction invariant and coverage bounds hold."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        n_toks=st.integers(1, 120),
        c=st.integers(2, 24),
        o=st.integers(0, 10),
        seed=st.integers(0, 10**6),
    )
    def check(n_toks, c, o, seed):
        if o >= c:
            o = c - 1
        import random

        rng = random.Random(seed)
        toks = [f"w{rng.randrange(50)}" for _ in range(n_toks)]
        text = " ".join(toks)
        df = spark.createDataFrame([(0, text)], schema="doc_id bigint, text string")
        out = (
            chunk_documents(df, c, o)
            .toPandas()
            .sort_values("chunk_id")
            .reset_index(drop=True)
        )
        rebuilt = []
        for _, row in out.iterrows():
            ct = row.chunk_text.split(" ")
            assert len(ct) == row.n_tokens
            assert row.n_tokens <= c
            rebuilt.extend(ct if row.chunk_id == 0 else ct[o:])
        assert rebuilt == toks

    check()


def test_pack_chunks_global_dense_and_bounded(spark):
    """Global packing: global_idx is a dense 0..n-1 enumeration in
    (doc_id, chunk_id) order across MANY input partitions, every pack
    holds exactly m chunks (last may be short), all within budget."""
    import numpy as np

    from pyogrio_spark.operators.chunking import pack_chunks_global

    rows = [
        (d, " ".join(f"d{d}w{i}" for i in range(5 + (d * 7) % 40)))
        for d in range(200)
    ]
    docs = spark.createDataFrame(rows, schema="doc_id bigint, text string").repartition(16)
    ch = chunk_documents(docs, C, O)
    out = pack_chunks_global(ch, budget_tokens=3 * C, chunk_tokens=C).toPandas()

    n = len(out)
    assert sorted(out.global_idx) == list(range(n))  # dense, no gaps
    ordered = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert list(ordered.global_idx) == list(range(n))  # order = (doc, chunk)
    assert (out.pack_id == out.global_idx // 3).all()
    sizes = out.groupby("pack_id").size()
    assert (sizes.iloc[:-1] == 3).all() if len(sizes) > 1 else True
    assert (out.groupby("pack_id").n_tokens.sum() <= 3 * C).all()

    with pytest.raises(ValueError, match="budget_tokens"):
        pack_chunks_global(ch, budget_tokens=C - 1, chunk_tokens=C)


def test_chunking_regex_special_separator(spark):
    """sep is literal: a '.'-separated doc must split on dots, not on
    every character (F.split is regex-based; the operator escapes)."""
    df = spark.createDataFrame([(0, "a.b.c.d.e")], schema="doc_id bigint, text string")
    out = chunk_documents(df, 3, 1, sep=".").toPandas().sort_values("chunk_id")
    assert list(out.chunk_text) == ["a.b.c", "c.d.e"]
    assert list(out.n_tokens) == [3, 3]
