"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — probes broadcast against the
corpus, dot products via zip_with/aggregate (JVM, codegen), per-probe
window rank. Exact; cost O(|corpus| x |probes|) per batch of probes,
which is the right tool when probes are a small query set.

Scale path: IVF — corpus bucketed once by nearest of C deterministic
centroids (one O(n·C) assignment pass, persisted); a probe scans only
its ``nprobe`` closest centroid buckets, cutting the scan to
~nprobe/C of the corpus. Recall < 1.0 by construction; the baseline
is the oracle for recall measurement.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    corpus_key: str = "vec_id",
    probe_key: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (probe_key, corpus_key, cosine, rank), exactly k per probe.
    Probes are broadcast: the corpus never shuffles."""
    p = probes.select(
        F.col(probe_key), F.col(vec_col).alias("_pvec"), _norm(F.col(vec_col)).alias("_pn")
    )
    c = corpus.select(
        F.col(corpus_key), F.col(vec_col).alias("_cvec"), _norm(F.col(vec_col)).alias("_cn")
    )
    joined = c.crossJoin(F.broadcast(p))
    cos = (_dot(F.col("_cvec"), F.col("_pvec")) / (F.col("_cn") * F.col("_pn"))).alias("cosine")
    w = Window.partitionBy(probe_key).orderBy(F.col("cosine").desc(), F.col(corpus_key).asc())
    return (
        joined.select(probe_key, corpus_key, cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def make_centroids(dim: int, n_centroids: int, seed: int = 29) -> np.ndarray:
    """Deterministic unit centroids (seeded Gaussian, normalized) — a
    k-means-free IVF codebook good enough for bucketing; swap in trained
    centroids without touching the query path."""
    rng = np.random.default_rng(seed)
    c = rng.normal(0, 1, (n_centroids, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _centroid_scores(vec_col, centroids: np.ndarray):
    return F.array(
        *[
            _dot(vec_col, F.array(*[F.lit(float(x)) for x in centroids[i]]))
            / F.greatest(_norm(vec_col), F.lit(1e-12))
            for i in range(centroids.shape[0])
        ]
    )


def ivf_train(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    seed: int = 29,
) -> np.ndarray:
    """Spherical k-means (Lloyd) on the corpus: assignment is the same
    JVM expression as ivf_assign; the update is one posexplode +
    groupBy(bucket, dim) avg per iteration — two shuffles total per
    round, no per-row Python. Deterministic (seeded init, fixed iters)."""
    cents = make_centroids(dim, n_centroids, seed)
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, vec_col)
        sums = (
            assigned.select("ivf_bucket", F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("ivf_bucket", "pos")
            .agg(F.avg("v").alias("m"))
            .toPandas()
        )
        new = cents.copy()
        for b, grp in sums.groupby("ivf_bucket"):
            vec = grp.sort_values("pos")["m"].to_numpy()
            norm = np.linalg.norm(vec)
            if norm > 0:
                new[int(b)] = vec / norm
        cents = new
    return cents


def ivf_assign(corpus: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> DataFrame:
    """Adds ``ivf_bucket`` = argmax-cosine centroid. One pass, persisted
    alongside the corpus (the analogue of the persisted cell_id column)."""
    scores = _centroid_scores(F.col(vec_col), centroids)
    best = F.array_position(scores, F.array_max(scores)) - 1
    return corpus.withColumn("ivf_bucket", best.cast("int"))


def ivf_topk(
    corpus_bucketed: DataFrame,
    probes: DataFrame,
    centroids: np.ndarray,
    k: int,
    nprobe: int = 4,
    corpus_key: str = "vec_id",
    probe_key: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe only the nprobe nearest centroid buckets."""
    scores = _centroid_scores(F.col(vec_col), centroids)
    idx = F.sequence(F.lit(0), F.lit(centroids.shape[0] - 1))
    ranked = F.reverse(F.array_sort(F.zip_with(scores, idx, lambda s, i: F.struct(s.alias("s"), i.alias("i")))))
    buckets = F.transform(F.slice(ranked, 1, nprobe), lambda x: x["i"])
    p = probes.select(
        probe_key,
        F.col(vec_col).alias("_pvec"),
        _norm(F.col(vec_col)).alias("_pn"),
        F.explode(buckets).alias("ivf_bucket"),
    )
    c = corpus_bucketed.select(
        corpus_key, "ivf_bucket", F.col(vec_col).alias("_cvec"), _norm(F.col(vec_col)).alias("_cn")
    )
    joined = c.join(F.broadcast(p), on="ivf_bucket")
    cos = (_dot(F.col("_cvec"), F.col("_pvec")) / (F.col("_cn") * F.col("_pn"))).alias("cosine")
    w = Window.partitionBy(probe_key).orderBy(F.col("cosine").desc(), F.col(corpus_key).asc())
    return (
        joined.select(probe_key, corpus_key, cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
