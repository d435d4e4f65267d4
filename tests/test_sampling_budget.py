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


def test_stratified_sample_deterministic_and_proportional(spark):
    import pandas as pd

    from pyogrio_spark.operators.sampling import stratified_sample

    pdf = pd.DataFrame({"doc_id": range(4000), "lang": ["en", "es", "fr", "de"] * 1000})
    df = spark.createDataFrame(pdf)
    out = stratified_sample(df, {"en": 0.5, "es": 0.1}, group_col="lang").toPandas()
    counts = out.groupby("lang").size()
    assert abs(counts["en"] - 500) < 80 and abs(counts["es"] - 100) < 50
    assert counts["fr"] == 1000 and counts["de"] == 1000  # unlisted groups kept whole
    out2 = stratified_sample(df, {"en": 0.5, "es": 0.1}, group_col="lang").toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)  # content-stable


def test_resample_to_weights_copies(spark):
    import pandas as pd

    from pyogrio_spark.operators.sampling import resample_to_weights

    pdf = pd.DataFrame({"doc_id": range(2000), "lang": ["en", "es"] * 1000})
    df = spark.createDataFrame(pdf)
    out = resample_to_weights(df, {"en": 2.5, "es": 0.25}, group_col="lang").toPandas()
    en = out[out.lang == "en"]
    es = out[out.lang == "es"]
    # every en doc appears 2 or 3 times; expectation 2.5
    per = en.groupby("doc_id").size()
    assert set(per.unique()) <= {2, 3} and abs(per.mean() - 2.5) < 0.1
    # es subsampled to ~25%, each kept doc exactly once
    assert abs(len(es) - 250) < 60 and es.groupby("doc_id").size().max() == 1
    # copy_idx is dense 0..n-1 per doc
    import numpy as np
    assert (en.groupby("doc_id").copy_idx.max().to_numpy() + 1 == en.groupby("doc_id").size().to_numpy()).all()


def test_percentile_filter_exact_ties_and_groups(spark):
    """percent_rank semantics: membership depends only on the score
    multiset; a tie group straddling the cut is in or out as one."""
    import pandas as pd

    from pyogrio_spark.operators.sampling import percentile_filter

    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "lang": ["en"] * 5 + ["es"] * 5,
            "q": [0.1, 0.2, 0.3, 0.4, 0.5, 0.7, 0.7, 0.7, 0.7, 0.9],
        }
    )
    out = percentile_filter(
        spark.createDataFrame(pdf), "q", 0.5, group_col="lang"
    ).toPandas()
    # en: ranks (0,.25,.5,.75,1) -> keep q>=0.3
    assert sorted(out[out.lang == "en"].q) == [0.3, 0.4, 0.5]
    # es: 0.7-tie has percent_rank 0 (first rank), 0.9 has 1.0 -> tie
    # group below the cut drops as one
    assert sorted(out[out.lang == "es"].q) == [0.9]


def test_percentile_filter_approx_band_and_plan(spark):
    """The two-phase approximate gate stays within the sketch's rank
    band of the exact gate and broadcasts the threshold (no corpus
    sort in the plan)."""
    import numpy as np
    import pandas as pd

    from pyogrio_spark.operators.sampling import (
        percentile_filter,
        percentile_filter_approx,
    )

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "doc_id": range(4000),
            "lang": ["en", "es"] * 2000,
            "q": np.round(rng.normal(0, 1, 4000), 6),
        }
    )
    df = spark.createDataFrame(pdf)
    exact = set(percentile_filter(df, "q", 0.8, group_col="lang").toPandas().doc_id)
    approx_df = percentile_filter_approx(df, "q", 0.8, group_col="lang", relative_error=0.001)
    approx = set(approx_df.toPandas().doc_id)
    # rank error bound: relative_error * n per group -> symmetric diff small
    assert len(exact ^ approx) <= 2 * int(0.001 * 2000) + 2
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "Sort" not in plan.split("BroadcastExchange")[0]  # no corpus sort feeding the filter
    # ungrouped form works too
    n_all = percentile_filter_approx(df, "q", 0.5).count()
    assert abs(n_all - 2000) < 50


def test_temperature_resample_targets_and_determinism(spark):
    from pyogrio_spark.operators.sampling import temperature_resample

    # 3 domains with sizes 64 / 16 / 4: sqrt weights 8 / 4 / 2 -> of a
    # 42-doc budget the integer targets are 42*8/14=24, 42*4/14=12,
    # 42*2/14=6 (exact integer arithmetic, no float boundary); the
    # small domain holds only 4 docs so its take caps there
    rows = [(i, "big") for i in range(64)]
    rows += [(100 + i, "mid") for i in range(16)]
    rows += [(200 + i, "small") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_resample(df, alpha=0.5, total=42, group_col="source")
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == {"big": 24, "mid": 12, "small": 4}
    # determinism: same member set on re-run
    ids1 = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in temperature_resample(df, alpha=0.5, total=42, group_col="source")
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2


def test_temperature_resample_flattens_vs_alpha1(spark):
    from pyogrio_spark.operators.sampling import temperature_resample

    rows = [(i, "big") for i in range(90)] + [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    t05 = temperature_resample(df, alpha=0.5, total=40, group_col="source")
    t10 = temperature_resample(df, alpha=1.0, total=40, group_col="source")
    share = lambda out: {  # noqa: E731
        r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    s05, s10 = share(t05), share(t10)
    # alpha=1 keeps raw proportions; alpha=0.5 lifts the small domain
    assert s10["small"] == 4 and s05["small"] > s10["small"]


def test_temperature_resample_broadcast_targets(spark):
    from pyogrio_spark.operators.sampling import temperature_resample

    df = spark.createDataFrame([(i, f"s{i % 3}") for i in range(30)], "doc_id bigint, source string")
    plan = (
        temperature_resample(df, alpha=0.5, total=10, group_col="source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # targets join the corpus broadcast-side
