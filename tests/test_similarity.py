import numpy as np
import pandas as pd
import pytest

from pyogrio_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_assign,
    ivf_topk,
    make_centroids,
)
from pyogrio_spark.operators.dedup import embedding_near_dup_pairs


@pytest.fixture(scope="module")
def vecs_pd():
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, (300, 16)).astype(np.float32)
    v[10] = v[0] * 1.001 + 0.001  # near-dup pair (0, 10)
    return pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64), "embedding": list(map(list, v))})


@pytest.fixture(scope="module")
def vecs(spark, vecs_pd):
    return spark.createDataFrame(vecs_pd, schema="vec_id long, embedding array<float>").cache()


def brute_oracle(vecs_pd, probes_pd, k):
    cv = np.array(vecs_pd.embedding.tolist(), dtype=np.float64)
    cn = np.linalg.norm(cv, axis=1)
    out = {}
    for _, p in probes_pd.iterrows():
        pv = np.array(p.embedding, dtype=np.float64)
        cos = cv @ pv / (cn * np.linalg.norm(pv))
        order = np.lexsort((vecs_pd.vec_id.values, -cos))[:k]
        out[p.probe_id] = [int(vecs_pd.vec_id.values[i]) for i in order]
    return out


def test_bruteforce_topk_matches_numpy(spark, vecs, vecs_pd):
    probes_pd = pd.DataFrame(
        {"probe_id": ["p0", "p1"], "embedding": [vecs_pd.embedding[0], vecs_pd.embedding[50]]}
    )
    probes = spark.createDataFrame(probes_pd, schema="probe_id string, embedding array<float>")
    got = cosine_topk_bruteforce(vecs, probes, k=10).toPandas()
    want = brute_oracle(vecs_pd, probes_pd, 10)
    for pid, grp in got.groupby("probe_id"):
        assert grp.sort_values("rank")["vec_id"].tolist() == want[pid]


def test_ivf_recall(spark, vecs, vecs_pd):
    cents = make_centroids(16, 8)
    bucketed = ivf_assign(vecs, cents).cache()
    assert bucketed.select("ivf_bucket").distinct().count() > 1
    probes_pd = pd.DataFrame(
        {"probe_id": [f"p{i}" for i in range(5)], "embedding": [vecs_pd.embedding[i * 7] for i in range(5)]}
    )
    probes = spark.createDataFrame(probes_pd, schema="probe_id string, embedding array<float>")
    got = ivf_topk(bucketed, probes, cents, k=10, nprobe=4).toPandas()
    want = brute_oracle(vecs_pd, probes_pd, 10)
    recalls = []
    for pid, grp in got.groupby("probe_id"):
        recalls.append(len(set(grp.vec_id) & set(want[pid])) / 10)
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 buckets


def test_ivf_trained_beats_or_matches_random(spark, vecs, vecs_pd):
    from pyogrio_spark.operators.similarity import ivf_train

    cents_r = make_centroids(16, 8)
    cents_t = ivf_train(vecs, dim=16, n_centroids=8, iters=2)
    probes_pd = pd.DataFrame(
        {"probe_id": [f"p{i}" for i in range(8)], "embedding": [vecs_pd.embedding[i * 11] for i in range(8)]}
    )
    probes = spark.createDataFrame(probes_pd, schema="probe_id string, embedding array<float>")
    want = brute_oracle(vecs_pd, probes_pd, 10)

    def recall(cents):
        got = ivf_topk(ivf_assign(vecs, cents), probes, cents, k=10, nprobe=3).toPandas()
        rs = [len(set(g.vec_id) & set(want[pid])) / 10 for pid, g in got.groupby("probe_id")]
        return float(np.mean(rs))

    r_rand, r_train = recall(cents_r), recall(cents_t)
    assert r_train >= r_rand - 0.05  # trained never materially worse
    assert r_train >= 0.6
    # determinism
    cents_t2 = ivf_train(vecs, dim=16, n_centroids=8, iters=2)
    np.testing.assert_allclose(cents_t, cents_t2)


def test_embedding_near_dup(spark, vecs):
    pairs = embedding_near_dup_pairs(vecs, threshold=0.999).toPandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False, name=None)))
    assert (0, 10) in got
    assert all(c >= 0.999 for c in pairs.cosine)


def test_embedding_near_dup_recall_and_cap(spark):
    # 40 planted near-dup pairs among 200 noise vectors: banded LSH must
    # recover most of what brute-force cosine finds at the threshold
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (240, 16)).astype(np.float32)
    for i in range(40):
        base[200 + i] = base[i] + rng.normal(0, 0.01, 16).astype(np.float32)  # cos ~ 0.9999
    pdf = pd.DataFrame({"vec_id": np.arange(240, dtype=np.int64), "embedding": list(map(list, base))})
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    got = embedding_near_dup_pairs(df, threshold=0.99).toPandas()
    got_pairs = set(map(tuple, got[["id_a", "id_b"]].itertuples(index=False, name=None)))
    # brute-force truth
    v = base.astype(np.float64)
    n = np.linalg.norm(v, axis=1)
    cos = (v @ v.T) / np.outer(n, n)
    ii, jj = np.where(np.triu(cos >= 0.99, k=1))
    want_pairs = set(zip(ii.tolist(), jj.tolist()))
    assert want_pairs, "fixture must contain true near-dups"
    recall = len(got_pairs & want_pairs) / len(want_pairs)
    assert recall >= 0.8, f"banded LSH recall {recall} below 0.8"
    assert not got_pairs - want_pairs  # verification step admits no false positives


def test_embedding_near_dup_bucket_cap_bounds_pairs(spark):
    # 500 IDENTICAL vectors (the hot-bucket pathology): pair volume must
    # be bounded by bands * max_bucket^2, not n^2
    pdf = pd.DataFrame({
        "vec_id": np.arange(500, dtype=np.int64),
        "embedding": [[1.0] * 16] * 500,
    })
    df = spark.createDataFrame(pdf, schema="vec_id long, embedding array<float>")
    got = embedding_near_dup_pairs(df, threshold=0.9, bands=4, max_bucket=16)
    n = got.count()
    assert n <= 4 * 16 * 15 / 2, f"{n} pairs from a hot bucket; cap is not applied"


def test_ivf2_exact_at_full_probe_and_recall(spark, vecs, vecs_pd):
    """Two-level IVF (coarse + shared residual fine codebook): probing
    every bucket is provably exact (equals brute force); pruned probing
    keeps useful recall while scanning a bounded candidate set."""
    from pyogrio_spark.operators.similarity import ivf2_assign, ivf2_topk, ivf2_train

    coarse, fine = ivf2_train(vecs, dim=16, n_coarse=4, n_fine=4, iters=2)
    assert coarse.shape == (4, 16) and fine.shape == (4, 16)
    bucketed = ivf2_assign(vecs, coarse, fine).cache()
    nb = bucketed.select("ivf2_bucket").distinct().count()
    assert 1 < nb <= 16  # real spread over coarse*fine cells
    # every row gets exactly one bucket in [0, 16)
    stats = bucketed.selectExpr(
        "min(ivf2_bucket) AS lo", "max(ivf2_bucket) AS hi", "count(*) AS n"
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < 16 and stats["n"] == 300

    probes_pd = vecs_pd.iloc[:8].rename(columns={"vec_id": "probe_id"})
    probes = spark.createDataFrame(probes_pd, schema="probe_id long, embedding array<float>")
    want = brute_oracle(vecs_pd, probes_pd, 5)

    # nprobe = all -> exact
    full = ivf2_topk(bucketed, probes, coarse, fine, k=5, nprobe_coarse=4, nprobe_fine=4)
    fdf = full.toPandas()
    got = {
        int(pid): grp.sort_values("rank").vec_id.astype(int).tolist()
        for pid, grp in fdf.groupby("probe_id")
    }
    assert got == want

    # pruned -> recall over the brute-force top-5
    pruned = ivf2_topk(bucketed, probes, coarse, fine, k=5, nprobe_coarse=2, nprobe_fine=2)
    hits = total = 0
    pr = pruned.toPandas()
    for pid, grp in pr.groupby("probe_id"):
        hits += len(set(grp.vec_id) & set(want[pid]))
        total += 5
    assert hits / total >= 0.5  # bounded scan, useful recall
    bucketed.unpersist()


def test_ivfpq_exact_at_full_probe_and_adc_recall(spark, vecs, vecs_pd):
    """IVF-PQ (coarse cells + product-quantized residuals + ADC
    lookup scoring): full probe + full rerank is provably exact;
    ADC-pruned rerank keeps recall at a bounded exact-dot budget, and
    at an EQUAL exact-dot budget the ADC candidate ordering beats
    plain two-level IVF pruning (the round-4 verdict's acceptance
    criterion) because ADC ranks every candidate in the probed cells
    before spending exact dots."""
    from pyogrio_spark.operators.similarity import (
        ivf2_assign,
        ivf2_topk,
        ivf2_train,
        ivfpq_assign,
        ivfpq_topk,
        ivf_train,
        pq_train,
    )

    coarse = ivf_train(vecs, dim=16, n_centroids=4, iters=2)
    books = pq_train(vecs, coarse, dim=16, m=4, k_sub=8, iters=2)
    assert books.shape == (4, 8, 4)
    coded = ivfpq_assign(vecs, coarse, books).cache()
    row = coded.select("pq_codes").first()
    assert len(row["pq_codes"]) == 4 and all(0 <= t < 8 for t in row["pq_codes"])

    probes_pd = vecs_pd.iloc[:8].rename(columns={"vec_id": "probe_id"})
    probes = spark.createDataFrame(probes_pd, schema="probe_id long, embedding array<float>")
    want = brute_oracle(vecs_pd, probes_pd, 5)

    # full probe + rerank=None -> exact (the oracle-covered twin)
    full = ivfpq_topk(coded, probes, coarse, books, k=5, nprobe=4, rerank=None)
    got = {
        int(pid): grp.sort_values("rank").vec_id.astype(int).tolist()
        for pid, grp in full.toPandas().groupby("probe_id")
    }
    assert got == want

    # ---- equal exact-dot budget comparison vs plain ivf2 pruning ----
    # ivf2 pruned at nprobe_coarse=2 x nprobe_fine=2 spends one exact
    # dot on every row of the 4 probed fine cells (of 4x4=16), i.e. a
    # budget of ~|corpus| * 4/16 exact dots per probe. IVF-PQ's value
    # proposition is spending that SAME exact-dot budget differently:
    # ADC lookups (m element_at's, no float-vector access) pre-rank
    # EVERY candidate in the probed coarse cells, and only the ADC
    # top-B get an exact dot. At equal B, ADC pre-ranking over the
    # whole corpus must not lose to scanning a geometric 1/4 subset.
    coarse2, fine2 = ivf2_train(vecs, dim=16, n_coarse=4, n_fine=4, iters=2)
    b2 = ivf2_assign(vecs, coarse2, fine2).cache()
    pruned2 = ivf2_topk(b2, probes, coarse2, fine2, k=5, nprobe_coarse=2, nprobe_fine=2)
    pr2 = pruned2.toPandas()
    hits2 = sum(
        len(set(grp.vec_id) & set(want[pid])) for pid, grp in pr2.groupby("probe_id")
    )
    n_rows = len(vecs_pd)
    budget = int(np.ceil(n_rows * 4 / 16))  # ivf2's expected exact dots/probe
    prq = ivfpq_topk(
        coded, probes, coarse, books, k=5, nprobe=4, rerank=budget
    ).toPandas()
    hitsq = sum(
        len(set(grp.vec_id) & set(want[pid])) for pid, grp in prq.groupby("probe_id")
    )
    total = 5 * len(want)
    assert hitsq / total >= 0.8
    assert hitsq >= hits2  # ADC-ordered rerank >= plain ivf2 at equal budget
    coded.unpersist()
    b2.unpersist()


def test_semantic_dedup_matches_numpy_rule(spark):
    """semantic_dedup with TRAINED k-means centroids (ivf_train — the
    variant the seeded-codebook oracle can't cover) matches a numpy
    replica of the exact rule: remove x iff some y < x in x's cluster
    has cosine >= eps."""
    import numpy as np

    from pyogrio_spark.operators.similarity import ivf_assign, ivf_train, semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_train(emb, dim=64, n_centroids=4, iters=2)
    kept = {r.vec_id for r in semantic_dedup(emb, cents, threshold=0.3).collect()}

    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=np.float64))
         for r in emb.select("vec_id", "embedding").collect()),
    )
    buckets = {
        r.vec_id: r.ivf_bucket for r in ivf_assign(emb, cents).select("vec_id", "ivf_bucket").collect()
    }
    expected = set()
    by_bucket: dict[int, list] = {}
    for vid, v in rows:
        removed = False
        for yid, y in by_bucket.get(buckets[vid], []):
            c = float(v @ y / (np.linalg.norm(v) * np.linalg.norm(y)))
            if c >= 0.3:
                removed = True
                break
        if not removed:
            expected.add(vid)
        by_bucket.setdefault(buckets[vid], []).append((vid, v))
    assert kept == expected


def test_semantic_dedup_probe_cap_superset_and_recall(spark):
    """The pruned variant (probe_cap) can only remove items that the
    exact variant also removes (removers are a subset), so its kept
    set is a superset; recall of the exact removals stays high on this
    data."""
    from pyogrio_spark.operators.similarity import make_centroids, semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = make_centroids(64, 8)
    exact = {r.vec_id for r in semantic_dedup(emb, cents, threshold=0.3).collect()}
    pruned = {
        r.vec_id
        for r in semantic_dedup(emb, cents, threshold=0.3, probe_cap=16).collect()
    }
    assert exact <= pruned
    n_all = emb.count()
    removed_exact = n_all - len(exact)
    removed_pruned = n_all - len(pruned)
    assert removed_exact > 0  # the threshold actually bites at sf0.01
    assert removed_pruned >= 0.5 * removed_exact  # cap=16 keeps most removals


def test_semantic_dedup_plan_bucket_bounded(spark):
    """No cartesian product and no Python stages: the pair join is an
    equi-join on ivf_bucket."""
    from pyogrio_spark.operators.similarity import make_centroids, semantic_dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, make_centroids(64, 8), threshold=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
