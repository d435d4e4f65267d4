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
