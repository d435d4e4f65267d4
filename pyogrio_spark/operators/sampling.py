"""Deterministic sampling / split assignment for training-data pipelines.

A 100-TB corpus is split train/val/test by *content-stable hashing*, not
randomness: the assignment of a document must never depend on partition
layout, cluster size, or execution order (the same guarantee the
reference gives for FID-addressed reads, /root/reference/pyogrio/
_io.pyx:1429-1525 — a row's identity, not its position, selects it).

md5 is used (not xxhash64) so an independent engine can re-derive every
assignment — the shared-hash rule of the oracle gate. The 60-bit prefix
keeps values < 2^61 (Spark ANSI-safe).

Everything here is pure JVM expression — whole-stage codegen, no
shuffle: a split assignment is a map-side stamp, and a filter on it
pushes into the scan of any table that persists the column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 1_000_000


def hash_bucket(key_col: str, salt: str = "split") -> Column:
    """Stable bucket in [0, BUCKETS) from md5(salt || key)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15), 16, 10)
    return (h.cast("bigint") % BUCKETS).alias("bucket")


def split_column(key_col: str, weights: dict[str, float], salt: str = "split") -> Column:
    """CASE expression assigning each row to a named split by cumulative
    weight thresholds over the hash bucket. Weights must sum to ~1."""
    names = list(weights)
    edges = []
    acc = 0.0
    for n in names:
        acc += weights[n]
        edges.append(int(round(acc * BUCKETS)))
    edges[-1] = BUCKETS  # absorb float residue
    b = hash_bucket(key_col, salt)
    expr = F.when(b < edges[0], F.lit(names[0]))
    for n, e in zip(names[1:], edges[1:]):
        expr = expr.when(b < e, F.lit(n))
    return expr


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Stamp a deterministic split column. Filtering a persisted split
    column prunes at the scan; re-running with the same salt reproduces
    the exact assignment on any cluster size."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn(split_col, split_column(key_col, weights, salt))


def hash_sample(df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = "sample") -> DataFrame:
    """Deterministic fraction sample (content-stable, unlike df.sample
    which depends on partition layout)."""
    return df.filter(hash_bucket(key_col, salt) < int(round(fraction * BUCKETS)))


def stratified_sample(
    df: DataFrame,
    fractions: dict,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-group sampling (e.g. rebalance languages):
    group g keeps fraction fractions[g] of its rows, selected by the
    same content-stable hash bucket as hash_sample — reproducible on
    any cluster size / partition layout. Groups absent from
    ``fractions`` are kept whole."""
    b = hash_bucket(key_col, salt)
    thresh = None
    for g, f in fractions.items():
        cut = F.when(F.col(group_col) == g, F.lit(int(round(f * BUCKETS))))
        thresh = cut if thresh is None else thresh.when(F.col(group_col) == g, F.lit(int(round(f * BUCKETS))))
    thresh = thresh.otherwise(F.lit(BUCKETS))
    return df.filter(b < thresh)


def resample_to_weights(
    df: DataFrame,
    weights: dict,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "mix",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Domain mixing: deterministically re-weight groups by duplication /
    subsampling. weights[g] = w means each row of group g appears
    floor(w) times plus one more with probability frac(w) (decided by
    the content-stable hash, so the SAME rows are the extras on every
    run). w < 1 is a subsample, w > 1 an upsample. Output rows carry
    ``copy_col`` (0-based) so downstream shuffles can still dedupe or
    interleave copies. Pure codegen: one CASE + sequence + explode, no
    shuffle."""
    b = hash_bucket(key_col, salt)
    n_copies = None
    for g, w in weights.items():
        whole = int(w)
        frac_cut = int(round((w - whole) * BUCKETS))
        expr = F.lit(whole) + F.when(b < F.lit(frac_cut), F.lit(1)).otherwise(F.lit(0))
        cond = F.col(group_col) == g
        n_copies = F.when(cond, expr) if n_copies is None else n_copies.when(cond, expr)
    n_copies = n_copies.otherwise(F.lit(1))
    out = df.withColumn("_nc", n_copies).filter(F.col("_nc") > 0)
    return (
        out.withColumn(copy_col, F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .drop("_nc")
    )


def percentile_filter(
    df: DataFrame,
    score_col: str,
    p: float,
    group_col: str | None = None,
) -> DataFrame:
    """Exact percentile gate — keep rows whose score sits at or above
    the ``p``-th percent-rank of their group (the "keep the top X% by
    quality score" curation step). Exact and tie-stable: percent_rank
    is ``(rank - 1) / (n - 1)`` with equal scores sharing a rank, so
    membership depends only on the score multiset, never on partition
    layout. Adds ``pct_rank``.

    Scale: a window over ``group_col`` is a per-group global sort —
    exactness costs one range-shuffle of the corpus. That is the
    honest price of an exact rank; the 100 TB fast path is
    ``percentile_filter_approx`` (two-phase: per-group approximate
    threshold, broadcast, map-side filter — no global sort), gated
    against this exact variant in tests.
    """
    keys = [group_col] if group_col else []
    w = Window.partitionBy(*keys).orderBy(F.col(score_col))
    out = df.withColumn("pct_rank", F.round(F.percent_rank().over(w), 9))
    return out.filter(F.col("pct_rank") >= F.lit(float(p)))


def percentile_filter_approx(
    df: DataFrame,
    score_col: str,
    p: float,
    group_col: str | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """Two-phase approximate percentile gate: per-group threshold via
    approxQuantile (Greenwald-Khanna, driver holds one scalar per
    group), then a broadcast map-side filter ``score >= threshold``.
    No global sort, no corpus shuffle — the plan a 1000-executor
    cluster wants. Guarantee: the threshold's rank error is bounded by
    ``relative_error`` * n, so membership differs from the exact gate
    only within that band (asserted in tests). One aggregation job for
    ALL groups (percentile_approx map-side sketches merge), thresholds
    broadcast-joined back — never a per-group driver loop."""
    accuracy = max(100, int(1.0 / max(relative_error, 1e-6)))
    if group_col is None:
        thr = df.agg(
            F.percentile_approx(score_col, F.lit(float(p)), F.lit(accuracy)).alias("_t")
        ).collect()[0]["_t"]
        return df.filter(F.col(score_col) >= F.lit(thr))
    thresholds = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, F.lit(float(p)), F.lit(accuracy)).alias("_thr")
    )
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    total: int = 100_000,
    group_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled domain sampling (the T5/mC4 rule): target
    counts proportional to n_g^alpha, flattening the domain imbalance
    a raw corpus has (alpha=1 keeps it, alpha=0 is uniform). Unlike
    ``resample_to_weights`` the weights here are DATA-DEPENDENT —
    derived from the observed group sizes — so the operator is
    two-phase: a group-count aggregate (|groups| rows), then a
    broadcast of the integer targets back onto a per-group
    md5-ordered exact take.

    Cross-engine exactness: the scaled weight is materialized as the
    INTEGER floor(n^alpha * 1e6); the group-sum and the target
    (total * s_g) / S are then pure integer arithmetic, immune to
    float summation order. alpha=0.5 routes through sqrt (correctly
    rounded in IEEE 754, so bit-identical on any engine); other
    alphas use pow, whose last-ulp may differ across libm builds —
    the 1e6 quantization makes that a 1-in-1e10 event, not zero.

    Scale: the only aggregates are |groups|-sized; the take is the
    stratified_sample window (per-group parallelism, dominant groups
    pre-cut by hash before ranking at production scale)."""
    n = F.col("_n").cast("double")
    s = F.floor((F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))) * 1e6).cast("bigint")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n")).withColumn("_s", s)
    # `_ssum`, not `_S`: Spark resolves case-insensitively, so `_S`
    # would collide with `_s` in the crossJoin output
    tot = counts.agg(F.sum("_s").alias("_ssum"))
    targets = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        # integer DIV, not `/`: bigint `/` is double division in Spark,
        # and total * s_g overflows the 2^53 double mantissa at corpus
        # scale — the quotient must stay exact integer arithmetic
        F.expr(f"CAST(({total}L * _s) DIV _ssum AS BIGINT)").alias("_target"),
    )
    w = Window.partitionBy(group_col).orderBy(F.md5(F.col(key_col).cast("string")), key_col)
    return (
        df.join(F.broadcast(targets), group_col)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= F.col("_target"))
        .drop("_target")
    )
