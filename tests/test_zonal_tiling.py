import numpy as np
import pandas as pd
import pytest

from pyogrio_spark.fixtures import DOCS_SPARK_SCHEMA, make_docs, make_zonal_raster, make_zones
from pyogrio_spark.operators.range_join import bbox_range_join, boxes_cell_cover
from pyogrio_spark.operators.spatial_join import zones_cell_cover
from pyogrio_spark.operators.tiling import adaptive_tiles, assign_adaptive, assign_tiles
from pyogrio_spark.operators.zonal import tiles_with_centers, zonal_stats
from pyogrio_spark.oracle import oracle_range_join, oracle_tiles, oracle_zonal


def test_zonal_matches_oracle(spark):
    zones_pd = make_zones(60)
    tiles_pd = make_zonal_raster(tile_deg=2.0)
    tiles = tiles_with_centers(
        spark.createDataFrame(tiles_pd, schema="tile_x int, tile_y int, value double"), tile_deg=2.0
    )
    cover = zones_cell_cover(spark, zones_pd)
    got = zonal_stats(tiles, cover).toPandas().sort_values("fid").reset_index(drop=True)
    want = oracle_zonal(tiles_pd, zones_pd, tile_deg=2.0).sort_values("fid").reset_index(drop=True)
    assert got["fid"].tolist() == want["fid"].tolist()
    for col in ("tile_count", "value_sum", "value_mean", "value_min", "value_max"):
        np.testing.assert_allclose(got[col], want[col], rtol=1e-9)


def test_tile_assignment_exact(spark):
    docs_pd = make_docs(1500)
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    got = assign_tiles(docs, res=9).select("doc_id", "tile_id").toPandas()
    want = oracle_tiles(docs_pd, res=9)
    m = got.merge(want, on="doc_id", suffixes=("_got", "_want"))
    assert (m.tile_id_got == m.tile_id_want).all()


def test_adaptive_tiles_balance_and_cover(spark):
    docs_pd = make_docs(4000)  # 30% hotspot mass forces splitting
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    tmap = adaptive_tiles(docs, base_res=3, max_res=10, target_rows=300)
    assert (tmap.res > 3).any(), "hot cells should have split"
    assigned = assign_adaptive(docs, tmap)
    assert assigned.count() == len(docs_pd)  # total cover, no row lost
    counts = assigned.groupBy("tile_id").count().toPandas()
    # deterministic: re-running yields the identical map
    tmap2 = adaptive_tiles(docs, base_res=3, max_res=10, target_rows=300)
    pd.testing.assert_frame_equal(tmap.reset_index(drop=True), tmap2.reset_index(drop=True))


def test_range_join_matches_oracle(spark):
    docs_pd = make_docs(1500)
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    rng = np.random.default_rng(21)
    boxes = pd.DataFrame(
        {
            "box_id": [f"box{i}" for i in range(25)],
            "xmin": rng.uniform(-170, 150, 25),
            "ymin": rng.uniform(-80, 60, 25),
        }
    )
    boxes["xmax"] = boxes.xmin + rng.uniform(1, 30, 25)
    boxes["ymax"] = boxes.ymin + rng.uniform(1, 20, 25)
    cover = boxes_cell_cover(spark, boxes)
    got = sorted(map(tuple, bbox_range_join(docs, cover).select("doc_id", "box_id").collect()))
    want = sorted(map(tuple, oracle_range_join(docs_pd, boxes).itertuples(index=False, name=None)))
    assert got == want and len(got) > 50


def test_areal_interpolate_conserves_mass(spark):
    """Weights per zone sum to 1 when the zone lies inside the grid, so
    total value is conserved; candidate enumeration is codegen (no
    Python before the clip kernel stage)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pyogrio_spark.geometry import wkb as W
    from pyogrio_spark.operators.zonal import areal_interpolate

    # irregular triangle zones (not grid-aligned), values 1..5
    rows = []
    for z in range(5):
        x0, y0 = -30.0 + z * 17.3, -20.0 + z * 9.1
        tri = np.array([(x0, y0), (x0 + 21.0, y0 + 2.0), (x0 + 4.0, y0 + 16.0), (x0, y0)])
        rows.append({"zone_id": z, "geometry_wkb": W.encode_polygon([tri])})
    zones = spark.createDataFrame(
        pd.DataFrame(rows), schema="zone_id bigint, geometry_wkb binary"
    ).withColumn("val", (F.col("zone_id") + 1).cast("double"))
    out = areal_interpolate(zones, "val", res=5)
    total = out.agg(F.sum("value")).first()[0]
    assert total == pytest.approx(1 + 2 + 3 + 4 + 5, rel=1e-9)
    # multiple tiles actually got slices
    assert out.count() > 5


def test_tile_pyramid_rollup_exact(spark):
    """Every level's total equals the corpus; each level's rows match a
    from-scratch aggregation at that res (parent rollup is exact)."""
    from pyspark.sql import functions as F

    from pyogrio_spark.index.grid import cell_expr_sql
    from pyogrio_spark.operators.tiling import tile_pyramid

    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (((F.col("id") * 2654435761) % 36000000) / 1e5 - 180).alias("lon"),
        (((F.col("id") * 40503) % 17000000) / 1e5 - 85).alias("lat"),
    )
    pyr = tile_pyramid(docs, base_res=7, min_res=3).cache()
    totals = {r["res"]: r["t"] for r in pyr.groupBy("res").agg(F.sum("n_docs").alias("t")).collect()}
    assert totals == {r: 2000 for r in range(3, 8)}
    for r in (3, 5, 7):
        scratch = (
            docs.groupBy(F.expr(cell_expr_sql("lon", "lat", r)).alias("cell"))
            .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_key"))
        )
        lvl = pyr.filter(F.col("res") == r).select("cell", "n_docs", "min_key")
        assert lvl.exceptAll(scratch).count() == 0 and scratch.exceptAll(lvl).count() == 0
    pyr.unpersist()


def test_tile_pyramid_rollup_not_corpus_per_level(spark):
    """The coarser levels must not re-scan the corpus. Since r8 the base
    level is pinned with localCheckpoint before the rollup chain, so the
    executed plan's union branches all hang off the checkpointed RDD —
    the corpus source must appear ZERO times in the final plan (stronger
    than the old per-branch ReusedExchange dedup this test asserted
    before), and the intermediate rollup levels still dedup via
    ReusedExchange/ReusedQueryStage."""
    from pyspark.sql import functions as F

    from pyogrio_spark.operators.tiling import tile_pyramid

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 360 - 180.0).alias("lon"),
        (F.col("id") % 170 - 85.0).alias("lat"),
    )
    out = tile_pyramid(docs, base_res=6, min_res=2)
    out.collect()  # AQE: reuse nodes materialize in the final plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus source (spark.range here) is fully absorbed by the
    # base-level checkpoint: no union branch re-reads it
    assert plan.count("Range (0, 100") == 0, plan[:2000]
    assert plan.count("Scan ExistingRDD") >= 1, plan[:2000]
    # intermediate levels (res 5..2 feed two branches each) still dedup
    assert plan.count("ReusedExchange") + plan.count("ReusedQueryStage") >= 2, plan[:2000]
