import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyogrio_spark.fixtures import DOCS_SPARK_SCHEMA, ZONES_SPARK_SCHEMA, make_docs, make_zones
from pyogrio_spark.functions.geo import span_digest
from pyogrio_spark.operators.spatial_join import (
    point_in_polygon_join,
    zones_cell_cover,
    zones_cell_cover_distributed,
)
from pyogrio_spark.oracle import oracle_pip_join


@pytest.fixture(scope="module")
def docs_pd():
    return make_docs(2000)


@pytest.fixture(scope="module")
def zones_pd():
    return make_zones()


@pytest.fixture(scope="module")
def docs_df(spark, docs_pd):
    return spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA).cache()


def pairs(df, zone_key="fid"):
    return sorted((r["doc_id"], r[zone_key]) for r in df.select("doc_id", zone_key).collect())


def test_pip_join_matches_oracle(spark, docs_df, docs_pd, zones_pd):
    cover = zones_cell_cover(spark, zones_pd)
    got = pairs(point_in_polygon_join(docs_df, cover, keep_doc_cols=["doc_id"]))
    want = list(oracle_pip_join(docs_pd, zones_pd)[["doc_id", "fid"]].itertuples(index=False, name=None))
    assert got == sorted(want)
    assert len(got) > 100  # non-trivial


def test_pip_join_shuffle_salted_same_result(spark, docs_df, docs_pd, zones_pd):
    from pyogrio_spark.operators.spatial_join import plan_salt_factors

    cover = zones_cell_cover(spark, zones_pd)
    base = pairs(point_in_polygon_join(docs_df, cover, keep_doc_cols=["doc_id"]))
    salted = pairs(
        point_in_polygon_join(docs_df, cover, keep_doc_cols=["doc_id"], broadcast_cover=False, salt=4)
    )
    plain_shuffle = pairs(point_in_polygon_join(docs_df, cover, keep_doc_cols=["doc_id"], broadcast_cover=False))
    # targeted per-hot-cell plan (hotspot fixture guarantees hot cells exist)
    plan = plan_salt_factors(docs_df, threshold_rows=20)
    assert len(plan) > 0 and (plan.salt_k > 1).any()
    planned = pairs(
        point_in_polygon_join(
            docs_df, cover, keep_doc_cols=["doc_id"], broadcast_cover=False, salt_plan=plan
        )
    )
    # plan determinism: same input -> identical plan
    plan2 = plan_salt_factors(docs_df, threshold_rows=20)
    assert plan.sort_values("cell_id").values.tolist() == plan2.sort_values("cell_id").values.tolist()
    assert base == salted == plain_shuffle == planned


def test_distributed_cover_matches_driver_cover(spark, zones_pd):
    zones_df = spark.createDataFrame(zones_pd, schema=ZONES_SPARK_SCHEMA)
    a = zones_cell_cover(spark, zones_pd).select("cell_id", "fid", "full_cover")
    b = zones_cell_cover_distributed(zones_df).select("cell_id", "fid", "full_cover")
    la = sorted(map(tuple, a.collect()))
    lb = sorted(map(tuple, b.collect()))
    assert la == lb


def test_spans_survive_pip_join(spark, docs_df, zones_pd):
    cover = zones_cell_cover(spark, zones_pd)
    before = {r["doc_id"]: r["d"] for r in docs_df.select("doc_id", span_digest().alias("d")).collect()}
    out = point_in_polygon_join(docs_df, cover, keep_doc_cols=["doc_id", "spans"])
    after = out.select("doc_id", span_digest().alias("d")).collect()
    assert len(after) > 0
    for r in after:
        assert before[r["doc_id"]] == r["d"], f"span digest drifted for {r['doc_id']}"


def test_full_cover_shortcut_is_exercised(spark, docs_df, zones_pd):
    # the scale story depends on interior cells skipping the refine
    cover = zones_cell_cover(spark, zones_pd)
    n_full = cover.filter("full_cover").count()
    assert n_full > 0
    joined = docs_df.join(F.broadcast(cover), on="cell_id")
    assert joined.filter("full_cover").count() > 0


def test_salting_splits_manufactured_hot_cell(spark):
    """Physical skew evidence (not just result parity): 90% of docs in
    ONE grid cell. Unsalted, that cell's join key lands on a single
    reducer; with a plan_salt_factors plan the same rows spread across
    >= 8 of 32 shuffle partitions and no task holds more than ~a salt
    share of the output."""
    import numpy as np

    from pyogrio_spark.geometry import wkb as W
    from pyogrio_spark.index.grid import cell_of
    from pyogrio_spark.operators.spatial_join import plan_salt_factors

    rng = np.random.default_rng(11)
    n_hot, n_cold_zones, per_cold = 9000, 10, 60

    # hot: one partially-covered cell (rect ends inside the cell, so no
    # full-cover shortcut — every row takes the join+refine path)
    hot_lon = rng.uniform(0.1, 1.0, n_hot)
    hot_lat = rng.uniform(0.1, 0.7, n_hot)
    rows = [("hot%06d" % i, float(hot_lon[i]), float(hot_lat[i])) for i in range(n_hot)]
    zones = [(0, W.encode_polygon([np.array(
        [[0.05, 0.05], [1.15, 0.05], [1.15, 0.75], [0.05, 0.75], [0.05, 0.05]])]))]
    for z in range(n_cold_zones):
        x0 = -150.0 + z * 3.0
        lon = rng.uniform(x0 + 0.1, x0 + 0.9, per_cold)
        lat = rng.uniform(-50.0 + 0.1, -50.0 + 0.7, per_cold)
        rows += [("c%02d_%04d" % (z, i), float(lon[i]), float(lat[i])) for i in range(per_cold)]
        zones.append((z + 1, W.encode_polygon([np.array(
            [[x0 + 0.05, -49.95], [x0 + 0.95, -49.95], [x0 + 0.95, -49.25],
             [x0 + 0.05, -49.25], [x0 + 0.05, -49.95]])])))

    docs_pd = pd.DataFrame(rows, columns=["doc_id", "xmin", "ymin"])
    docs_pd["cell_id"] = cell_of(docs_pd.xmin.to_numpy(), docs_pd.ymin.to_numpy(), 7)
    zones_pd = pd.DataFrame(zones, columns=["fid", "geometry_wkb"])

    docs = spark.createDataFrame(
        docs_pd, schema="doc_id string, xmin double, ymin double, cell_id long"
    ).repartition(8)
    cover = zones_cell_cover(spark, zones_pd)

    old = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.shuffle.partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # force the shuffle join this test is about (the planner would
    # otherwise auto-broadcast the tiny cover and hide the skew)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_salt_factors(docs, threshold_rows=500)
        assert len(plan) == 1 and int(plan.salt_k.iloc[0]) == 18  # ceil(9000/500)

        def pid_counts(df):
            got = (
                df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid").count().collect()
            )
            return {r["pid"]: r["count"] for r in got}

        unsalted = point_in_polygon_join(
            docs, cover, keep_doc_cols=["doc_id"], broadcast_cover=False
        )
        salted = point_in_polygon_join(
            docs, cover, keep_doc_cols=["doc_id"], broadcast_cover=False, salt_plan=plan
        )
        # same answer first
        assert pairs(salted) == pairs(unsalted) and len(pairs(salted)) == len(rows)

        cu, cs = pid_counts(unsalted), pid_counts(salted)
        total = sum(cu.values())
        # unsalted: the hot cell is one reduce key -> one task owns >=90%
        assert max(cu.values()) / total >= 0.9
        # salted: the same rows spread over many tasks, none dominant
        big = [c for c in cs.values() if c >= 100]
        assert len(big) >= 8, cs
        assert max(cs.values()) / total <= 0.3, cs
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_cell_natively(spark):
    """Production complement to manual salting: with AQE skew-join
    enabled (thresholds scaled to the fixture), the SAME unsalted
    shuffle join gets its hot partition split by OptimizeSkewedJoin —
    plan shows skew=true — and the result is unchanged. At cluster
    scale the engine can therefore rely on AQE for moderate skew and
    reserve plan_salt_factors for the extreme cells AQE's per-partition
    splitting cannot reach (one KEY hotter than a partition)."""
    import numpy as np

    from pyogrio_spark.geometry import wkb as W
    from pyogrio_spark.index.grid import cell_of

    rng = np.random.default_rng(13)
    n_hot = 6000
    hot_lon = rng.uniform(0.1, 1.0, n_hot)
    hot_lat = rng.uniform(0.1, 0.7, n_hot)
    rows = [("hot%06d" % i, float(hot_lon[i]), float(hot_lat[i])) for i in range(n_hot)]
    zones = [(0, W.encode_polygon([np.array(
        [[0.05, 0.05], [1.15, 0.05], [1.15, 0.75], [0.05, 0.75], [0.05, 0.05]])]))]
    docs_pd = pd.DataFrame(rows, columns=["doc_id", "xmin", "ymin"])
    docs_pd["cell_id"] = cell_of(docs_pd.xmin.to_numpy(), docs_pd.ymin.to_numpy(), 7)
    docs = spark.createDataFrame(
        docs_pd, schema="doc_id string, xmin double, ymin double, cell_id long"
    ).repartition(8)
    cover = zones_cell_cover(spark, pd.DataFrame(zones, columns=["fid", "geometry_wkb"]))

    old = {k: spark.conf.get(k) for k in (
        "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.shuffle.partitions",
    )}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # scale AQE's skew thresholds down to fixture size (defaults are
    # 256MB-scale); factor stays default-ish: hot partition >> median
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    try:
        out = point_in_polygon_join(
            docs, cover, keep_doc_cols=["doc_id"], broadcast_cover=False
        )
        got = out.collect()  # action on THIS frame finalizes its AQE plan
        assert len(got) == n_hot  # every doc inside the one zone
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        ):
            spark.conf.unset(k)
