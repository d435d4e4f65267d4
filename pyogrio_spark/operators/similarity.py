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
    """Per-centroid cosine scores as ONE parsed SQL expression. The
    Column-object build (C x dim F.lit py4j calls — ~600 at 8x64) cost
    ~0.7s of driver time per invocation; the parsed string resolves to
    the IDENTICAL Catalyst tree (same HOF fold, same double literals —
    D-suffix parity pytest-verified), so results are bit-equal."""
    vec = _col_sql(vec_col)
    exprs = []
    for i in range(centroids.shape[0]):
        lits = ",".join(f"{float(x)!r}D" for x in centroids[i])
        exprs.append(
            f"aggregate(zip_with({vec}, array({lits}), (x, y) -> x * y),"
            f" 0.0D, (acc, x) -> acc + x)"
            f" / greatest(sqrt(aggregate({vec}, 0.0D, (acc, x) -> acc + x * x)), 1e-12D)"
        )
    return F.expr("array(" + ",".join(exprs) + ")")


def _col_sql(col) -> str:
    """SQL text for a plain column reference (Column or name)."""
    name = col._jc.toString() if not isinstance(col, str) else col
    return f"`{name}`"


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


# ------------------------------------------------------- two-level IVF
#
# At real corpus scale an inverted file wants far more cells than a
# flat codebook affords (C >> 256 means C dot products per row just to
# assign). The standard fix is hierarchical: a coarse codebook plus a
# SHARED fine codebook over coarse RESIDUALS — n_coarse * n_fine
# effective cells for only n_coarse + n_fine dot products per row.
# bucket = coarse * n_fine + fine(residual). Exact when every bucket is
# probed (the brute-force oracle covers that variant); pruned probing
# is recall-gated like single-level IVF.


def _lit_vec(row):
    """Literal double array as ONE parsed expression — dim F.lit py4j
    calls otherwise dominate driver time (see _centroid_scores);
    D-suffix double-literal parity is pytest-verified."""
    return F.expr("array(" + ",".join(f"{float(x)!r}D" for x in row) + ")")


def _select_centroid(arr2d: np.ndarray, idx_col):
    """Literal array-of-arrays -> the row's own centroid (1-based
    element_at); selection only, no dot products."""
    rows = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in row) + ")" for row in arr2d
    )
    return F.element_at(F.expr(f"array({rows})"), idx_col + 1)


def _residual(vec_col, coarse: np.ndarray, bucket_col):
    """v - coarse[bucket] (normalized v, matching the spherical coarse
    quantizer's geometry)."""
    unit = F.transform(vec_col, lambda x: x / F.greatest(_norm(vec_col), F.lit(1e-12)))
    return F.zip_with(unit, _select_centroid(coarse, bucket_col), lambda x, c: x - c)


def _fine_scores(res_col, fine: np.ndarray):
    """argmin-L2 scores over the shared fine codebook:
    dot(r, f_i) - ||f_i||^2 / 2 (monotone in -||r - f_i||^2)."""
    return F.array(
        *[
            _dot(res_col, _lit_vec(fine[i]))
            - F.lit(float(np.dot(fine[i], fine[i]) / 2.0))
            for i in range(fine.shape[0])
        ]
    )


def ivf2_train(
    corpus: DataFrame,
    dim: int,
    n_coarse: int = 8,
    n_fine: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    seed: int = 29,
) -> tuple[np.ndarray, np.ndarray]:
    """Train (coarse, fine): coarse = spherical k-means (ivf_train);
    fine = Lloyd k-means over coarse residuals with ONE shared
    codebook — each iteration is the same posexplode + groupBy(avg)
    shape as ivf_train (two shuffles per round, no per-row Python)."""
    coarse = ivf_train(corpus, dim, n_coarse, iters, vec_col, seed)
    assigned = ivf_assign(corpus, coarse, vec_col).withColumn(
        "_res", _residual(F.col(vec_col), coarse, F.col("ivf_bucket"))
    )
    rng = np.random.default_rng(seed + 1)
    fine = rng.normal(0, 0.1, (n_fine, dim))
    for _ in range(iters):
        f_idx = (F.array_position(
            _fine_scores(F.col("_res"), fine),
            F.array_max(_fine_scores(F.col("_res"), fine)),
        ) - 1).cast("int")
        sums = (
            assigned.withColumn("_f", f_idx)
            .select("_f", F.posexplode("_res").alias("pos", "v"))
            .groupBy("_f", "pos")
            .agg(F.avg("v").alias("m"))
            .toPandas()
        )
        new = fine.copy()
        for b, grp in sums.groupby("_f"):
            new[int(b)] = grp.sort_values("pos")["m"].to_numpy()
        fine = new
    return coarse, fine


def ivf2_assign(
    corpus: DataFrame, coarse: np.ndarray, fine: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Adds ``ivf2_bucket`` = coarse_bucket * n_fine + fine_bucket —
    one persisted integer column, n_coarse + n_fine dots per row."""
    out = ivf_assign(corpus, coarse, vec_col)
    res = _residual(F.col(vec_col), coarse, F.col("ivf_bucket"))
    scores = _fine_scores(res, fine)
    f_idx = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    return out.withColumn(
        "ivf2_bucket", (F.col("ivf_bucket") * fine.shape[0] + f_idx).cast("int")
    ).drop("ivf_bucket")


def ivf2_topk(
    corpus_bucketed: DataFrame,
    probes: DataFrame,
    coarse: np.ndarray,
    fine: np.ndarray,
    k: int,
    nprobe_coarse: int = 4,
    nprobe_fine: int = 4,
    corpus_key: str = "vec_id",
    probe_key: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-level IVF search: a probe expands to its nprobe_coarse
    nearest coarse cells x nprobe_fine nearest fine cells per coarse
    cell (candidate buckets broadcast; the corpus side never shuffles).
    nprobe_coarse = n_coarse and nprobe_fine = n_fine scans every
    bucket — provably exact, the oracle-covered variant."""
    n_fine = fine.shape[0]
    cscores = _centroid_scores(F.col(vec_col), coarse)
    cidx = F.sequence(F.lit(0), F.lit(coarse.shape[0] - 1))
    cranked = F.reverse(
        F.array_sort(F.zip_with(cscores, cidx, lambda s, i: F.struct(s.alias("s"), i.alias("i"))))
    )
    coarse_picks = F.transform(F.slice(cranked, 1, nprobe_coarse), lambda x: x["i"])
    p = probes.select(
        probe_key,
        F.col(vec_col).alias("_pvec"),
        _norm(F.col(vec_col)).alias("_pn"),
        F.explode(coarse_picks).alias("_cb"),
    )
    res = _residual(F.col("_pvec"), coarse, F.col("_cb"))
    fscores = _fine_scores(res, fine)
    fidx = F.sequence(F.lit(0), F.lit(n_fine - 1))
    franked = F.reverse(
        F.array_sort(F.zip_with(fscores, fidx, lambda s, i: F.struct(s.alias("s"), i.alias("i"))))
    )
    fine_picks = F.transform(F.slice(franked, 1, nprobe_fine), lambda x: x["i"])
    p = p.select(probe_key, "_pvec", "_pn", "_cb", F.explode(fine_picks).alias("_fb"))
    p = p.select(
        probe_key, "_pvec", "_pn",
        (F.col("_cb") * n_fine + F.col("_fb")).cast("int").alias("ivf2_bucket"),
    )
    c = corpus_bucketed.select(
        corpus_key, "ivf2_bucket", F.col(vec_col).alias("_cvec"), _norm(F.col(vec_col)).alias("_cn")
    )
    joined = c.join(F.broadcast(p), on="ivf2_bucket")
    cos = (_dot(F.col("_cvec"), F.col("_pvec")) / (F.col("_cn") * F.col("_pn"))).alias("cosine")
    w = Window.partitionBy(probe_key).orderBy(F.col("cosine").desc(), F.col(corpus_key).asc())
    return (
        joined.select(probe_key, corpus_key, cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


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


# --------------------------------------------- IVF-PQ (ADC search)
#
# The PQ fine quantizer on coarse residuals (the classic IVFADC layout,
# Jegou/Douze/Schmid "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011 — public literature, not reference code): the
# unit corpus vector decomposes as unit = coarse[b] + r, and r is
# encoded as m subspace codes against per-subspace codebooks. Search
# builds ONE m x k_sub lookup table per probe (dot(p_unit_j, cb_j[t]),
# k_sub * D multiplies total), after which every candidate scores with
# just m array lookups instead of D multiplies — the asymmetric
# distance computation (ADC). Exact cosine is recomputed only for the
# top ``rerank`` ADC candidates per probe. With nprobe = n_coarse and
# rerank=None (exact pass over every candidate) the result is provably
# exact — the oracle-covered twin; pruned search is recall-gated in
# tests.


def _sub(vec, j: int, dsub: int):
    return F.slice(vec, j * dsub + 1, dsub)


def _pq_codes(res_col, codebooks: np.ndarray):
    """codes[j] = argmin_t ||r_j - cb[j][t]||^2, via the same
    dot - |c|^2/2 monotone trick as the fine codebook. Returns an
    array<int> of length m."""
    m, k_sub, dsub = codebooks.shape
    codes = []
    for j in range(m):
        scores = F.array(
            *[
                _dot(_sub(res_col, j, dsub), _lit_vec(codebooks[j][t]))
                - F.lit(float(np.dot(codebooks[j][t], codebooks[j][t]) / 2.0))
                for t in range(k_sub)
            ]
        )
        codes.append((F.array_position(scores, F.array_max(scores)) - 1).cast("int"))
    return F.array(*codes)


def pq_train(
    corpus: DataFrame,
    coarse: np.ndarray,
    dim: int,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    seed: int = 29,
) -> np.ndarray:
    """Train the (m, k_sub, dim//m) PQ codebooks over coarse residuals:
    per iteration, one codegen encode pass + one posexplode/groupBy avg
    shuffle (the ivf_train/ivf2_train shape — no per-row Python).
    Deterministic (seeded init, fixed iters)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    assigned = ivf_assign(corpus, coarse, vec_col).withColumn(
        "_res", _residual(F.col(vec_col), coarse, F.col("ivf_bucket"))
    )
    rng = np.random.default_rng(seed + 2)
    books = rng.normal(0, 0.1, (m, k_sub, dsub))
    for _ in range(iters):
        codes = _pq_codes(F.col("_res"), books)
        sums = (
            assigned.withColumn("_codes", codes)
            .select("_codes", F.posexplode("_res").alias("pos", "v"))
            .withColumn("_j", (F.col("pos") / dsub).cast("int"))
            .withColumn("_t", F.element_at("_codes", F.col("_j") + 1))
            .groupBy("_j", "_t", "pos")
            .agg(F.avg("v").alias("mval"))
            .toPandas()
        )
        new = books.copy()
        for (j, t), grp in sums.groupby(["_j", "_t"]):
            vec = grp.sort_values("pos")["mval"].to_numpy()
            new[int(j)][int(t)] = vec
        books = new
    return books


def ivfpq_assign(
    corpus: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``ivf_bucket`` (coarse cell) + ``pq_codes`` (array<int>,
    length m) — the persisted inverted-file layout: n_coarse + m*k_sub
    subspace dots per row at ingest, m small ints per row of storage
    (the 100-TB point of PQ: the scored working set is codes, not
    float vectors)."""
    out = ivf_assign(corpus, coarse, vec_col)
    res = _residual(F.col(vec_col), coarse, F.col("ivf_bucket"))
    return out.withColumn("pq_codes", _pq_codes(res, codebooks))


def ivfpq_topk(
    corpus_coded: DataFrame,
    probes: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    k: int,
    nprobe: int = 4,
    rerank: int | None = 32,
    corpus_key: str = "vec_id",
    probe_key: str = "probe_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search: probe -> nprobe coarse cells; per probe ONE
    m x k_sub LUT of subspace dots; candidates score as
    dot(p_unit, coarse[cell]) + sum_j LUT[j][codes[j]] (m lookups,
    no float-vector access); exact cosine recomputed for the top
    ``rerank`` ADC candidates only (rerank=None -> every candidate,
    exact when nprobe = n_coarse). Probe side broadcast; the corpus
    never shuffles before the final per-probe rank."""
    m, k_sub, dsub = codebooks.shape
    cscores = _centroid_scores(F.col(vec_col), coarse)
    cidx = F.sequence(F.lit(0), F.lit(coarse.shape[0] - 1))
    cranked = F.reverse(
        F.array_sort(F.zip_with(cscores, cidx, lambda s, i: F.struct(s.alias("s"), i.alias("i"))))
    )
    coarse_picks = F.transform(F.slice(cranked, 1, nprobe), lambda x: x["i"])
    punit = F.transform(
        F.col(vec_col), lambda x: x / F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))
    )
    lut = F.array(
        *[
            F.array(
                *[
                    _dot(_sub(F.col("_punit"), j, dsub),
                         _lit_vec(codebooks[j][t]))
                    for t in range(k_sub)
                ]
            )
            for j in range(m)
        ]
    )
    p = (
        probes.select(
            probe_key,
            F.col(vec_col).alias("_pvec"),
            _norm(F.col(vec_col)).alias("_pn"),
            punit.alias("_punit"),
            F.explode(coarse_picks).alias("ivf_bucket"),
        )
        .withColumn("_lut", lut)
        .withColumn(
            "_cellterm",
            _dot(F.col("_punit"), _select_centroid(coarse, F.col("ivf_bucket"))),
        )
        .drop("_punit")
    )
    c = corpus_coded.select(
        corpus_key, "ivf_bucket", "pq_codes",
        F.col(vec_col).alias("_cvec"), _norm(F.col(vec_col)).alias("_cn"),
    )
    joined = c.join(F.broadcast(p), on="ivf_bucket")
    adc = F.col("_cellterm") + F.aggregate(
        F.sequence(F.lit(1), F.lit(m)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(F.element_at("_lut", j), F.element_at("pq_codes", j) + 1),
    )
    joined = joined.withColumn("_adc", adc)
    if rerank is not None:
        w_adc = Window.partitionBy(probe_key).orderBy(
            F.col("_adc").desc(), F.col(corpus_key).asc()
        )
        joined = joined.withColumn("_adc_rank", F.row_number().over(w_adc)).filter(
            F.col("_adc_rank") <= max(int(rerank), k)
        )
    cos = (_dot(F.col("_cvec"), F.col("_pvec")) / (F.col("_cn") * F.col("_pn"))).alias("cosine")
    w = Window.partitionBy(probe_key).orderBy(F.col("cosine").desc(), F.col(corpus_key).asc())
    return (
        joined.select(probe_key, corpus_key, cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# --------------------------------------------------------------- SemDeDup


def semantic_dedup(
    corpus: DataFrame,
    centroids: np.ndarray,
    threshold: float,
    vec_col: str = "embedding",
    key: str = "vec_id",
    probe_cap: int | None = None,
    salt: int = 8,
) -> DataFrame:
    """Semantic deduplication, SemDeDup-shape (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space with k-means
    (``ivf_train`` centroids or the seeded ``make_centroids``
    codebook), then within each cluster remove every item that is
    too close to an earlier one.

    Keep rule: item x is REMOVED iff some y with key(y) < key(x) in
    the same cluster has cosine(x, y) >= threshold — the deterministic
    per-pair rule (SemDeDup removes one item per over-threshold pair;
    keeping the lowest key is its "keep one example" made
    reproducible). Not a transitive closure: y itself may also have
    been removed by an even earlier item.

    Scale design: pair volume is Σ cluster², never corpus² — the
    cluster count C is chosen so n/C is partition-sized (the same
    bucket-bounding argument as the LSH band join, spatial-join cells,
    and IVF probing). ``probe_cap`` additionally bounds skewed
    clusters: only the first ``probe_cap`` items per cluster (by key)
    act as removers, making the per-cluster cost linear in cap x size
    (recall gated in tests, exactly like pruned-nprobe IVF). Cosines
    are computed on double-cast vectors so the decision boundary is
    bit-reproducible in ANSI SQL (float products diverge ~1e-9 across
    engines).

    Returns the KEPT rows: ``(key, ivf_bucket)``.
    """
    from pyogrio_spark.cache import pin_cache

    dim = int(centroids.shape[1])
    dv = F.col(vec_col).cast("array<double>")
    # cached: consumed three times (both pair sides + the final
    # anti-join); at storage scale the assignment is a persisted column
    # (ivf_assign docstring), so the cache stands in for that table
    assigned = pin_cache(
        ivf_assign(corpus, centroids, vec_col).select(key, "ivf_bucket", dv.alias("_v"))
    )

    # The cosine runs once PER CANDIDATE PAIR (Σ cluster² rows), so its
    # per-row cost is the whole operator. The interpreted HOF fold
    # (_dot) costs ~9µs/row at dim 64; unrolled element_at chains
    # codegen but deserialize the array per term and measured SLOWER
    # (5.7s vs 2.55s at sf0.1). Winning layout: flatten each side to
    # `dim` scalar double columns BEFORE the join — the array is
    # decoded once per ROW, and the post-join cosine is straight-line
    # double arithmetic (~4x over the unrolled chain). The wide
    # expressions are built as SQL strings (selectExpr — one py4j
    # call, JVM-side parse): Column-object construction at dim 64 cost
    # 1.9s of driver time per invocation, more than the job itself.
    # Accumulation order is _dot/_norm's exact left fold
    # (0.0 + t1 + t2 + ...), so results are bit-equal and the SQL
    # oracle's UNNEST-sum parity is unaffected.
    def _flat(df, kname, p, nname):
        cols = [f"element_at(_v, {i}) AS {p}{i}" for i in range(1, dim + 1)]
        nsum = " + ".join(
            f"element_at(_v, {i}) * element_at(_v, {i})" for i in range(1, dim + 1)
        )
        return df.selectExpr(
            f"`{key}` AS {kname}", "ivf_bucket", *cols,
            f"sqrt(0.0D + {nsum}) AS {nname}",
        )

    a = _flat(assigned, "_ky", "_y", "_ny")
    if probe_cap is not None:
        wcap = Window.partitionBy("ivf_bucket").orderBy("_ky")
        a = a.withColumn("_r", F.row_number().over(wcap)).filter(
            F.col("_r") <= int(probe_cap)
        ).drop("_r")
    b = _flat(assigned, "_kx", "_x", "_nx")
    # Salted pair join (guide §2.5): the join key alone has only
    # |clusters| distinct values, so however many shuffle partitions
    # exist, at most |clusters| tasks do Σ cluster² work — on a 32-core
    # session with 8 clusters, 3/4 of the cores idled. Salt the probe
    # (x) side deterministically by key, explode the remover (y) side
    # across all salts: every pair still meets exactly once (the salt
    # is a function of _kx), per-task work drops ~salt-fold, and the
    # replicated side is the capped/lighter one. Measured 10.7 s ->
    # 3.8 s at sf1.0 with bit-identical output.
    S = max(1, int(salt))
    a = a.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    # xxhash64, not key % S: works for ANY key type (a string key would
    # make pmod NULL and silently match nothing) and spreads clustered
    # numeric ids
    b = b.withColumn("_salt", F.pmod(F.xxhash64(F.col("_kx")), F.lit(S)).cast("int"))
    dsum = " + ".join(f"_x{i} * _y{i}" for i in range(1, dim + 1))
    cos = F.expr(f"(0.0D + {dsum}) / (_nx * _ny)")
    # shuffle-hash, not sort-merge (guide §3.1): the build side is the
    # salted remover slice (per-partition hash map of ~1-2 MB of
    # flattened vectors) and the probe side streams — no sorting of
    # 130-column rows, and far less execution memory, which keeps the
    # operator's wall time flat late in a long session when the heap
    # is already populated (measured 7.8 s -> 5.8 s after a ten-query
    # prefix, identical clean-window time, bit-identical output).
    removed = (
        b.join(a.hint("shuffle_hash"), on=["ivf_bucket", "_salt"])
        .filter(F.col("_ky") < F.col("_kx"))
        .filter(cos >= F.lit(float(threshold)))
        .select(F.col("_kx").alias(key))
        .distinct()
    )
    return assigned.join(removed, on=key, how="left_anti").select(key, "ivf_bucket")


def cluster_balanced_sample(
    corpus: DataFrame,
    centroids: np.ndarray,
    n_per_cluster: int,
    key: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-balanced subset selection: assign every vector to its
    argmax-cosine cluster (the same persisted-``ivf_bucket`` expression
    as ivf_assign) and keep exactly min(n, |cluster|) members per
    cluster, deterministically ordered by md5(key) — so rare modes of
    the embedding space survive a downsample that a uniform sample
    would wash out (the cluster-balancing step of SemDeDup/DataComp
    curation). Content-stable: re-runs and resumes pick identical
    members. One window per cluster; at corpus scale cluster count
    (thousands) is the parallelism, and a dominant cluster is pre-cut
    by hash before ranking exactly as stratified_sample documents."""
    assigned = ivf_assign(corpus, centroids, vec_col)
    w = Window.partitionBy("ivf_bucket").orderBy(F.md5(F.col(key).cast("string")), key)
    return (
        assigned.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= n_per_cluster)
        .select(key, "ivf_bucket", "rn")
    )
