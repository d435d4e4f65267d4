"""Deterministic split/sample + token-budget operators."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyogrio_spark.operators.budget import budget_filter, budget_filter_window
from pyogrio_spark.operators.sampling import hash_sample, hash_split


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": range(2000),
            "lang": [("en", "es", "fr", "de")[i % 4] for i in range(2000)],
            "tokens": [(i * 2654435761) % 997 + 1 for i in range(2000)],
        }
    )
    return spark.createDataFrame(pdf, schema="doc_id bigint, lang string, tokens bigint").cache()


def test_hash_split_deterministic_and_partition_invariant(corpus):
    a = hash_split(corpus).select("doc_id", "split").toPandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        hash_split(corpus.repartition(17))
        .select("doc_id", "split")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
    frac = (a.split == "train").mean()
    assert 0.95 < frac < 1.0  # 98% nominal


def test_hash_split_weights_cover_all_rows(corpus):
    out = hash_split(corpus, weights={"a": 0.5, "b": 0.3, "c": 0.2})
    counts = dict(out.groupBy("split").count().collect())
    assert sum(counts.values()) == 2000 and set(counts) == {"a", "b", "c"}


def test_hash_sample_subset_semantics(corpus):
    s10 = set(r.doc_id for r in hash_sample(corpus, 0.10).select("doc_id").collect())
    s20 = set(r.doc_id for r in hash_sample(corpus, 0.20).select("doc_id").collect())
    assert s10 <= s20  # growing the fraction only adds rows
    assert 0.05 < len(s10) / 2000 < 0.15


def test_budget_filter_matches_window_plan(corpus):
    kwargs = dict(budget=20_000, group_col="lang", value_col="tokens", order_cols=("doc_id",))
    fast = budget_filter(corpus, num_partitions=7, **kwargs)
    ref = budget_filter_window(corpus, **kwargs)
    got = sorted(map(tuple, fast.select("doc_id", "lang").collect()))
    want = sorted(map(tuple, ref.select("doc_id", "lang").collect()))
    assert got == want and len(got) > 0


def test_budget_filter_first_fit_semantics(corpus):
    out = budget_filter(corpus, budget=1, group_col="lang", value_col="tokens", order_cols=("doc_id",))
    # budget 1: exactly the first doc of each lang is kept (starts at 0 < 1)
    kept = out.groupBy("lang").agg(F.count("*").alias("n"), F.min("doc_id").alias("first")).collect()
    assert all(r.n == 1 for r in kept)
    assert sorted(r.first for r in kept) == [0, 1, 2, 3]
