"""Driver-contract queries + DuckDB oracle SQL.

Each ``QUERIES[name]`` runs the *engine* path on Spark (WKB encode ->
bounds decode -> cell index -> cover -> join -> refine, etc.); each
``ORACLES[name]`` is an independent ANSI-SQL re-derivation DuckDB runs
on the same parquet tables. Geometry inputs are synthesized
deterministically from ``doc_id`` with integer arithmetic that both
engines evaluate bit-identically; synthetic boundaries carry a +-5e-6
offset so no point ever lands on a zone/bbox edge (the engines use
different but interior-equivalent predicates).

Shared-hash rule: md5 is the only hash both engines expose, so every
oracle-checked signature (minhash, simhash, fingerprints) uses the
60-bit md5 prefix (``_hash60`` in operators/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyogrio_spark.fixtures import DEFAULT_RES as GEO_RES
from pyogrio_spark.functions.geo import bounds_columns, cell_id_column, point_wkb_column
from pyogrio_spark.functions.text import LANG_PROFILES, lang_id, quality_score, token_count, word_piece_count
from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.index.grid import cell_expr_sql
from pyogrio_spark.io.reader import read_table
from pyogrio_spark.operators.dedup import (
    exact_dedup,
    fingerprint_overlap_pairs,
    winnow_fingerprints,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_column,
)
from pyogrio_spark.operators.knn import knn_join
from pyogrio_spark.operators.range_join import bbox_range_join, boxes_cell_cover
from pyogrio_spark.operators.similarity import cosine_topk_bruteforce, ivf_assign, ivf_topk, make_centroids
from pyogrio_spark.operators.spatial_join import point_in_polygon_join, zones_cell_cover
from pyogrio_spark.operators.tiling import adaptive_tiles, assign_tiles
from pyogrio_spark.operators.zonal import tiles_with_centers, zonal_stats

TILE_RES = 9

# deterministic doc geometry: pure int64 arithmetic, identical in Spark &
# DuckDB. NB: 1e5-style literals, NOT 100000.0 — literals with a decimal
# point parse as DECIMAL in both engines and their decimal-division
# rounding differs; scientific notation is DOUBLE in both.
LON_EXPR = "((doc_id * 2654435761) % 36000000) / 1e5 - 180"
LAT_EXPR = "((doc_id * 40503) % 17000000) / 1e5 - 85"
DOCS_GEO_SQL = f"(SELECT doc_id, {LON_EXPR} AS lon, {LAT_EXPR} AS lat FROM documents)"

# 200 rectangular zones in 20x10 slots, deterministic jittered margins,
# boundaries offset by 5e-6 so no synthesized point hits an edge
ZONES_SQL = """(
  SELECT z AS zone_id,
         -180 + (z % 20) * 18 + (z * 7) % 5 + 0.000005  AS zx0,
         -180 + (z % 20) * 18 + 18 - (z * 3) % 4 - 0.000005 AS zx1,
         -90 + (z // 20) * 18 + (z * 11) % 5 + 0.000005 AS zy0,
         -90 + (z // 20) * 18 + 18 - (z * 5) % 4 - 0.000005 AS zy1
  FROM (SELECT unnest(generate_series(0, 199)) AS z)
)"""


def _zones_pd() -> pd.DataFrame:
    rows = []
    for z in range(200):
        col, row = z % 20, z // 20
        x0 = -180.0 + col * 18 + (z * 7) % 5 + 0.000005
        x1 = -180.0 + col * 18 + 18 - (z * 3) % 4 - 0.000005
        y0 = -90.0 + row * 18 + (z * 11) % 5 + 0.000005
        y1 = -90.0 + row * 18 + 18 - (z * 5) % 4 - 0.000005
        ring = np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])
        rows.append({"zone_id": z, "geometry_wkb": W.encode_polygon([ring])})
    return pd.DataFrame(rows)


def _boxes_pd() -> pd.DataFrame:
    rows = []
    for b in range(30):
        x0 = -170.0 + (b * 37) % 310 + 0.3
        y0 = -80.0 + (b * 53) % 150 + 0.3
        rows.append(
            {"box_id": b, "xmin": x0, "ymin": y0, "xmax": x0 + 5 + (b * 7) % 20, "ymax": y0 + 4 + (b * 11) % 12}
        )
    return pd.DataFrame(rows)


BOXES_SQL = """(
  SELECT b AS box_id,
         -170 + (b * 37) % 310 + 0.3 AS bx0,
         -80 + (b * 53) % 150 + 0.3 AS by0,
         -170 + (b * 37) % 310 + 0.3 + 5 + (b * 7) % 20 AS bx1,
         -80 + (b * 53) % 150 + 0.3 + 4 + (b * 11) % 12 AS by1
  FROM (SELECT unnest(generate_series(0, 29)) AS b)
)"""


# weak-keyed by the session object: a GC'd session drops its cached
# plans (an id(spark) key could collide after id reuse and pinned the
# entries for the process lifetime)
import weakref

_DOCS_GEO_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _docs_geo(spark: SparkSession, sf: str) -> DataFrame:
    """documents + derived point geometry through the full engine path:
    arithmetic lon/lat -> WKB encode -> envelope decode -> cell index.

    Cached per (session, sf): geometry/envelope/cell are *persisted*
    columns in the engine's data model (FIXTURES.md F1) — deriving them
    is a one-time ingest cost, not a per-query cost, so queries sharing a
    session share the materialized derivation exactly as they would share
    the stored table."""
    per_session = _DOCS_GEO_CACHE.get(spark)
    if per_session is None:
        per_session = _DOCS_GEO_CACHE.setdefault(spark, {})
    hit = per_session.get(sf)
    if hit is not None:
        return hit
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    docs = docs.withColumn("lon", F.expr(LON_EXPR)).withColumn("lat", F.expr(LAT_EXPR))
    docs = docs.withColumn("geometry_wkb", point_wkb_column("lon", "lat"))
    docs = bounds_columns(docs)  # exercises the WKB decode kernel
    docs = docs.withColumn("cell_id", cell_id_column("xmin", "ymin", GEO_RES)).cache()
    per_session[sf] = docs
    return docs


def _register_views(spark: SparkSession, sf: str, tables=("lineitem", "orders", "customer", "nation", "region", "events")):
    for t in tables:
        spark.read.parquet(f"{sf}/{t}.parquet").createOrReplaceTempView(t)


# scan-split memo: one .rdd.getNumPartitions() planning round trip per
# (session, path), not per query invocation
_SCAN_PARTS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _read_spread(spark: SparkSession, path: str, key: str = "doc_id") -> DataFrame:
    """Scale-adaptive scan spread for the CPU-heavy text/vector tables
    (guide §2.5 "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    The test corpora are written as a single parquet row group, which
    Spark cannot split below one task — so the whole pre-exchange map
    side of a query (tokenizing, hashing, regex, span synthesis) would
    run on ONE core no matter how many the session has (measured 5.1 s
    -> 0.8 s for text_features at sf1.0 on local[32]). Spread the scan
    to the session's default parallelism when (and only when) the scan
    yields fewer splits; a production multi-file table already scans
    with >= cores splits and passes through untouched, so nothing is
    shuffled at 100 TB.

    The spread target is size-aware (~256 KB of encoded parquet per
    task, capped at the session parallelism): at the smoke scales a
    full-cores spread of a 1 MB table turns every downstream stage into
    32 near-empty tasks, and iterative operators (the kNN ring loop)
    pay that scheduler overhead once per round — measured as the guide
    §2.2 small-task pathology in miniature."""
    df = spark.read.parquet(path)
    sc = spark.sparkContext
    memo = _SCAN_PARTS.get(spark)
    if memo is None:
        memo = _SCAN_PARTS.setdefault(spark, {})
    got = memo.get(path)
    if got is None:
        import math
        import os as _os

        if _os.path.isfile(path):
            size = _os.path.getsize(path)
        else:
            size = sum(
                _os.path.getsize(_os.path.join(r, f))
                for r, _d, fs in _os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            )
        target = max(2, min(sc.defaultParallelism, math.ceil(size / (256 * 1024))))
        got = (df.rdd.getNumPartitions(), target)
        memo[path] = got
    n, target = got
    # hash by the row key rather than round-robin: the key is unique so
    # the spread is just as even, there is no sort-before-repartition,
    # and every downstream doc-keyed window/groupBy reuses the spread's
    # partitioning instead of adding its own Exchange of a much larger
    # derived stream (guide §2.4; repetition_scores 8.3 -> 3.4 s,
    # minhash 3.2 -> 2.7 s measured in the same window)
    return df.repartition(target, key) if n < target else df


# =============================================================== geo queries

def q_scan_where_project(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return read_table(
        spark, docs, columns=["doc_id", "lang", "n_chars"], where="lang = 'en' AND n_chars > 200", read_geometry=False
    )


def q_scan_skip_max(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return read_table(
        spark, docs, columns=["doc_id", "lang", "n_chars"], where="lang = 'en'",
        skip_features=100, max_features=50, read_geometry=False,
    )


def q_geo_bbox(spark, sf):
    out = read_table(spark, _docs_geo(spark, sf), bbox=(-50.000003, -20.000003, 30.000003, 40.000003))
    return out.select("doc_id", "lon", "lat")


def q_geo_mask(spark, sf):
    # convex diamond mask: ray-cast PIP on the engine side, the equivalent
    # linear inequality on the oracle side
    cx, cy, a, b = 10.0001, 5.0001, 60.0, 40.0
    ring = np.array([(cx - a, cy), (cx, cy - b), (cx + a, cy), (cx, cy + b), (cx - a, cy)])
    mask = W.encode_polygon([ring])
    return read_table(spark, _docs_geo(spark, sf), mask=mask).select("doc_id", "lon", "lat")


def q_geo_tile_assignment(spark, sf):
    return assign_tiles(_docs_geo(spark, sf), res=TILE_RES, lon_col="lon", lat_col="lat").select("doc_id", "tile_id")


def q_geo_pip_join(spark, sf):
    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    return point_in_polygon_join(_docs_geo(spark, sf), cover, zone_key="zone_id", keep_doc_cols=["doc_id"])


def q_geo_pip_join_salted(spark, sf):
    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    return point_in_polygon_join(
        _docs_geo(spark, sf), cover, zone_key="zone_id", keep_doc_cols=["doc_id"], broadcast_cover=False, salt=4
    )


_BUCKETED_CACHE: dict = {}


def _bucketed_pip_tables(spark, sf):
    """One-time bucketed WRITE of both PIP join sides (docs + zone cover)
    on cell_id — the co-location primitive: every subsequent join over
    these tables runs with ZERO exchanges because the bucketed scans
    already deliver the join partitioning. Cached per (session, sf),
    mirroring how a production pipeline writes the bucketed corpus once
    and joins it many times."""
    key = (id(spark), sf)
    hit = _BUCKETED_CACHE.get(key)
    if hit is not None:
        return hit
    import tempfile

    from pyogrio_spark.io.writer import write_bucketed

    d = tempfile.mkdtemp(prefix="pyogrio_spark_buckets_")
    docs = _docs_geo(spark, sf).select("doc_id", "xmin", "ymin", "cell_id")
    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    write_bucketed(docs, "pip_docs_bkt", ["cell_id"], 32, sort_cols=["cell_id"], path=f"{d}/docs")
    write_bucketed(cover, "pip_cover_bkt", ["cell_id"], 32, sort_cols=["cell_id"], path=f"{d}/cover")
    hit = (spark.table("pip_docs_bkt"), spark.table("pip_cover_bkt"))
    _BUCKETED_CACHE[key] = hit
    return hit


def q_geo_pip_join_bucketed(spark, sf):
    """PIP join over CO-LOCATED bucketed tables: same results as
    geo_pip_join (same oracle), different physical plan — both sides
    pre-bucketed on cell_id (32 buckets), the shuffle_hash hint keeps
    the planner off broadcast, and the coarse equi-join runs with zero
    Exchange operators (plan-asserted in tests/test_plans.py). This is
    the amortized shape for repeated 100-TB spatial joins: one bucketed
    write, many shuffle-free joins."""
    docs_b, cover_b = _bucketed_pip_tables(spark, sf)
    return point_in_polygon_join(
        docs_b,
        cover_b.hint("shuffle_hash"),
        zone_key="zone_id",
        keep_doc_cols=["doc_id"],
        broadcast_cover=False,
    )


def _diamond_zones_pd() -> pd.DataFrame:
    """100 diamond (rotated-square) zones in 10x10 slots of 36x18 deg —
    NON-rectangular polygons, so the PIP join's generic pandas ray-cast
    refine runs (the rect zones above short-circuit to the JVM interval
    predicate). Centers carry a 7e-6 offset off the 1e-5 coordinate
    lattice so no synthesized point lands on a diamond edge."""
    rows = []
    for z in range(100):
        cx = -180.0 + (z % 10) * 36 + 18.000007
        cy = -90.0 + (z // 10) * 18 + 9.000007
        a = 16.0 - (z * 3) % 5
        b = 8.0 - (z * 5) % 4
        ring = np.array([(cx - a, cy), (cx, cy - b), (cx + a, cy), (cx, cy + b), (cx - a, cy)])
        rows.append({"zone_id": z, "geometry_wkb": W.encode_polygon([ring])})
    return pd.DataFrame(rows)


DIAMONDS_SQL = """(
  SELECT z AS zone_id,
         -180 + (z % 10) * 36 + 18.000007 AS cx,
         -90 + (z // 10) * 18 + 9.000007 AS cy,
         16 - (z * 3) % 5 AS a,
         8 - (z * 5) % 4 AS b
  FROM (SELECT unnest(generate_series(0, 99)) AS z)
)"""


def q_geo_pip_join_poly(spark, sf):
    """PIP join against NON-rectangular zones: exercises the generic
    per-polygon prepared ray-cast refine (mapInPandas) that the rect
    zones of geo_pip_join bypass via the JVM interval fast path. Oracle:
    the diamond interior is the linear inequality |dx|/a + |dy|/b < 1."""
    cover = zones_cell_cover(spark, _diamond_zones_pd(), res=GEO_RES, zone_key="zone_id")
    return point_in_polygon_join(_docs_geo(spark, sf), cover, zone_key="zone_id", keep_doc_cols=["doc_id"])


ORACLE_PIP_POLY = f"""
SELECT d.doc_id, z.zone_id FROM {DOCS_GEO_SQL} d JOIN {DIAMONDS_SQL} z
ON abs(d.lon - z.cx) / z.a + abs(d.lat - z.cy) / z.b < 1
"""


def _edge_zone_params():
    """Integer-edged zones for the boundary-inclusive PIP query: 8 rects
    (JVM interval path) + 3 diamonds with 45-degree edges through integer
    lattice points (generic refine path). Floored doc coordinates are
    integer-valued doubles, so points land EXACTLY on these edges and
    every on-edge comparison is float-exact in both engines."""
    rects = []
    for z in range(8):
        x0 = -170 + (z % 4) * 80
        y0 = -80 + (z // 4) * 85
        rects.append((z, x0, y0, x0 + 60, y0 + 50))
    diamonds = [(100, -120, 60, 20), (101, 40, -60, 22), (102, 140, 10, 25)]
    return rects, diamonds


def _edge_zones_pd() -> pd.DataFrame:
    rects, diamonds = _edge_zone_params()
    rows = []
    for z, x0, y0, x1, y1 in rects:
        ring = np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)], dtype=float)
        rows.append({"zone_id": z, "geometry_wkb": W.encode_polygon([ring])})
    for z, cx, cy, r in diamonds:
        ring = np.array([(cx - r, cy), (cx, cy - r), (cx + r, cy), (cx, cy + r), (cx - r, cy)], dtype=float)
        rows.append({"zone_id": z, "geometry_wkb": W.encode_polygon([ring])})
    return pd.DataFrame(rows)


def q_geo_pip_join_boundary(spark, sf):
    """Boundary-INCLUSIVE PIP join (GEOS ``intersects`` semantics, the
    reference's spatial-filter convention, _io.pyx:887-908): doc
    coordinates are floored to the integer lattice so many land exactly
    ON integer zone edges; include_boundary=True must keep them on BOTH
    refine paths (rect JVM closed interval + generic ray-cast with the
    exact on-segment test)."""
    docs = _read_spread(spark, f"{sf}/documents.parquet").select("doc_id")
    docs = docs.withColumn("lon", F.expr(f"CAST(floor({LON_EXPR}) AS DOUBLE)"))
    docs = docs.withColumn("lat", F.expr(f"CAST(floor({LAT_EXPR}) AS DOUBLE)"))
    docs = docs.withColumn("geometry_wkb", point_wkb_column("lon", "lat"))
    docs = bounds_columns(docs)
    docs = docs.withColumn("cell_id", cell_id_column("xmin", "ymin", GEO_RES))
    cover = zones_cell_cover(spark, _edge_zones_pd(), res=GEO_RES, zone_key="zone_id")
    return point_in_polygon_join(
        docs, cover, zone_key="zone_id", keep_doc_cols=["doc_id"], include_boundary=True
    )


def _oracle_pip_boundary() -> str:
    rects, diamonds = _edge_zone_params()
    rect_vals = ", ".join(f"({z}, {x0}, {y0}, {x1}, {y1})" for z, x0, y0, x1, y1 in rects)
    dia_vals = ", ".join(f"({z}, {cx}, {cy}, {r})" for z, cx, cy, r in diamonds)
    return f"""
WITH d AS (SELECT doc_id, CAST(floor({LON_EXPR}) AS DOUBLE) AS lon,
                  CAST(floor({LAT_EXPR}) AS DOUBLE) AS lat FROM documents),
z AS (SELECT * FROM (VALUES {rect_vals}) AS t(zone_id, zx0, zy0, zx1, zy1)),
dz AS (SELECT * FROM (VALUES {dia_vals}) AS t(zone_id, cx, cy, r))
SELECT d.doc_id, CAST(z.zone_id AS BIGINT) AS zone_id FROM d JOIN z
  ON d.lon >= z.zx0 AND d.lon <= z.zx1 AND d.lat >= z.zy0 AND d.lat <= z.zy1
UNION ALL
SELECT d.doc_id, CAST(dz.zone_id AS BIGINT) AS zone_id FROM d JOIN dz
  ON abs(d.lon - dz.cx) + abs(d.lat - dz.cy) <= dz.r
"""


# rect half-extents derived from doc_id: 0.1..0.7 x 0.1..0.5 degrees.
# Integer-scaled arithmetic (grid 1e-5) keeps corners off zone edges
# (zones carry the +-5e-6 offset).
RECT_W_EXPR = "(1 + doc_id % 7) / 1e1"
RECT_H_EXPR = "(1 + doc_id % 5) / 1e1"


def q_geo_zonal_poly(spark, sf):
    """Zonal stats against NON-rect zones: boundary tiles go through the
    generic center-in-polygon pandas refine (rect zones short-circuit to
    the JVM box predicate). Oracle: diamond-interior linear inequality
    over tile centers."""
    tiles = spark.range(180 * 90).select(
        (F.col("id") % 180 - 90).cast("int").alias("tile_x"),
        (F.col("id") / 180).cast("int").__sub__(F.lit(45)).cast("int").alias("tile_y"),
    )
    tiles = tiles.withColumn(
        "value", ((F.col("tile_x").cast("bigint") * 31 + F.col("tile_y").cast("bigint") * 17) % 97).cast("double")
    )
    tiles = tiles_with_centers(tiles, tile_deg=2.0, res=GEO_RES)
    cover = zones_cell_cover(spark, _diamond_zones_pd(), res=GEO_RES, zone_key="zone_id")
    out = zonal_stats(tiles, cover, zone_key="zone_id")
    return out.select(
        "zone_id", "tile_count", "value_sum", F.col("value_mean").alias("value_mean"), "value_min", "value_max"
    )


ORACLE_ZONAL_POLY = f"""
WITH tiles AS (
  SELECT tile_x, tile_y,
         CAST((tile_x * 31 + tile_y * 17) % 97 AS DOUBLE) AS value,
         (tile_x + 0.5) * 2.0 AS cx, (tile_y + 0.5) * 2.0 AS cy
  FROM (SELECT unnest(generate_series(-90, 89)) AS tile_x) a
  CROSS JOIN (SELECT unnest(generate_series(-45, 44)) AS tile_y) b
)
SELECT z.zone_id,
       count(*) AS tile_count,
       sum(t.value) AS value_sum,
       sum(t.value) / count(*) AS value_mean,
       min(t.value) AS value_min,
       max(t.value) AS value_max
FROM tiles t JOIN {DIAMONDS_SQL} z
  ON abs(t.cx - z.cx) / z.a + abs(t.cy - z.cy) / z.b < 1
GROUP BY z.zone_id
"""


def q_geo_rasterize(spark, sf):
    """Vector -> raster: burn (diamond) zone ids into the 2-deg tile
    grid by the center rule — the inverse of zonal_stats, completing the
    raster<->vector pair. Overlaps resolve to the min zone id."""
    from pyogrio_spark.operators.zonal import rasterize_zones

    tiles = spark.range(180 * 90).select(
        (F.col("id") % 180 - 90).cast("int").alias("tile_x"),
        (F.col("id") / 180).cast("int").__sub__(F.lit(45)).cast("int").alias("tile_y"),
    )
    tiles = tiles_with_centers(tiles.withColumn("value", F.lit(0.0)), tile_deg=2.0, res=GEO_RES)
    cover = zones_cell_cover(spark, _diamond_zones_pd(), res=GEO_RES, zone_key="zone_id")
    return rasterize_zones(tiles, cover, zone_key="zone_id")


ORACLE_RASTERIZE = f"""
WITH tiles AS (
  SELECT tile_x, tile_y, (tile_x + 0.5) * 2.0 AS cx, (tile_y + 0.5) * 2.0 AS cy
  FROM (SELECT unnest(generate_series(-90, 89)) AS tile_x) a
  CROSS JOIN (SELECT unnest(generate_series(-45, 44)) AS tile_y) b
)
SELECT t.tile_x, t.tile_y, min(z.zone_id) AS zone_id
FROM tiles t JOIN {DIAMONDS_SQL} z
  ON abs(t.cx - z.cx) / z.a + abs(t.cy - z.cy) / z.b < 1
GROUP BY t.tile_x, t.tile_y
"""


def q_geo_intersects_join(spark, sf):
    """Generic geometry-geometry ST_Intersects theta-join — the
    reference's canonical SQL spatial-join example
    (/root/reference/docs/source/introduction.md:291-307) with non-point
    left geometries (rectangles around each doc point)."""
    from pyogrio_spark.functions.geo import rect_wkb_column
    from pyogrio_spark.operators.intersects_join import intersects_join

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    docs = docs.withColumn("lon", F.expr(LON_EXPR)).withColumn("lat", F.expr(LAT_EXPR))
    docs = (
        docs.withColumn("xmin", F.expr(f"lon - ({RECT_W_EXPR})"))
        .withColumn("xmax", F.expr(f"lon + ({RECT_W_EXPR})"))
        .withColumn("ymin", F.expr(f"lat - ({RECT_H_EXPR})"))
        .withColumn("ymax", F.expr(f"lat + ({RECT_H_EXPR})"))
    )
    docs = docs.withColumn("geometry_wkb", rect_wkb_column("xmin", "ymin", "xmax", "ymax"))
    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    return intersects_join(docs, cover, res=GEO_RES, zone_key="zone_id", left_key="doc_id").select(
        "doc_id", "zone_id"
    )


ORACLE_INTERSECTS = f"""
SELECT d.doc_id, z.zone_id FROM {DOCS_GEO_SQL} d JOIN {ZONES_SQL} z
ON d.lon - ((1 + d.doc_id % 7) / 1e1) <= z.zx1 AND d.lon + ((1 + d.doc_id % 7) / 1e1) >= z.zx0
AND d.lat - ((1 + d.doc_id % 5) / 1e1) <= z.zy1 AND d.lat + ((1 + d.doc_id % 5) / 1e1) >= z.zy0
"""


def q_geo_intersects_join_poly(spark, sf):
    """Non-rectangle left geometries through the SAME operator — exercises
    the generic vectorized refine (``batch_intersects``), which the
    all-rect query above never reaches (its rect fast path short-circuits).
    Left: right triangles with axis-aligned legs (lon,lat)-(lon+w,lat)-
    (lon,lat+h); a closed triangle intersects a closed rect iff their
    bboxes overlap AND the rect's lower-left-most feasible corner sits
    under the hypotenuse — exactly expressible in the SQL oracle."""
    from pyogrio_spark.functions.geo import tri_wkb_column
    from pyogrio_spark.operators.intersects_join import intersects_join

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    docs = (
        docs.withColumn("lon", F.expr(LON_EXPR))
        .withColumn("lat", F.expr(LAT_EXPR))
        .withColumn("x1", F.expr(f"lon + ({RECT_W_EXPR})"))
        .withColumn("y2", F.expr(f"lat + ({RECT_H_EXPR})"))
        .withColumn("xmin", F.col("lon"))
        .withColumn("ymin", F.col("lat"))
        .withColumn("xmax", F.col("x1"))
        .withColumn("ymax", F.col("y2"))
    )
    docs = docs.withColumn("geometry_wkb", tri_wkb_column("lon", "lat", "x1", "lat", "lon", "y2"))
    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    return intersects_join(docs, cover, res=GEO_RES, zone_key="zone_id", left_key="doc_id").select(
        "doc_id", "zone_id"
    )


# triangle {x>=lon, y>=lat, (x-lon)/w + (y-lat)/h <= 1} vs rect
# [zx0,zx1]x[zy0,zy1]: both convex; intersection nonempty iff the
# clipped bbox is nonempty and its lower-left corner (where the
# hypotenuse constraint is minimal) satisfies the constraint.
ORACLE_INTERSECTS_POLY = f"""
SELECT d.doc_id, z.zone_id FROM {DOCS_GEO_SQL} d JOIN {ZONES_SQL} z
ON greatest(d.lon, z.zx0) <= least(d.lon + ((1 + d.doc_id % 7) / 1e1), z.zx1)
AND greatest(d.lat, z.zy0) <= least(d.lat + ((1 + d.doc_id % 5) / 1e1), z.zy1)
AND (greatest(d.lon, z.zx0) - d.lon) / ((1 + d.doc_id % 7) / 1e1)
  + (greatest(d.lat, z.zy0) - d.lat) / ((1 + d.doc_id % 5) / 1e1) <= 1
"""


def q_curve_linearize(spark, sf):
    """Non-linear geometry ingest: per-doc CircularString arcs (semicircle
    of radius r over each point) are linearized at parse — the engine's
    analogue of the reference's scan-time OGR_G_GetLinearGeometry
    (/root/reference/pyogrio/_io.pyx:1015-1017). The oracle checks the
    downgraded type, the 4-deg sampling density (ceil(180/4)+1 = 46
    vertices), and the exact envelope (endpoints are kept verbatim, so
    a top semicircle's xmin/ymin/xmax are closed-form)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("gtype string, n_pts bigint, xmin double, ymin double, xmax double")
    def lin_desc(lon: pd.Series, lat: pd.Series, r: pd.Series) -> pd.DataFrame:
        lo, la, rr = (s.to_numpy(np.float64) for s in (lon, lat, r))
        arcs = W.encode_circularstrings(lo - rr, la, lo, la + rr, lo + rr, la)
        rows = []
        for b in arcs:
            g = W.parse_wkb(bytes(b))
            pts = g.coords
            rows.append((g.type, len(pts), pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max()))
        return pd.DataFrame(rows, columns=["gtype", "n_pts", "xmin", "ymin", "xmax"])

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    docs = (
        docs.withColumn("lon", F.expr(LON_EXPR))
        .withColumn("lat", F.expr(LAT_EXPR))
        .withColumn("r", F.expr("(1 + doc_id % 9) / 1e1"))
    )
    out = docs.withColumn("_d", lin_desc("lon", "lat", "r"))
    return out.select(
        "doc_id", F.col("_d.gtype").alias("gtype"), F.col("_d.n_pts").alias("n_pts"),
        F.col("_d.xmin").alias("xmin"), F.col("_d.ymin").alias("ymin"), F.col("_d.xmax").alias("xmax"),
    )


ORACLE_CURVE = f"""
SELECT doc_id, 'LineString' AS gtype, CAST(46 AS BIGINT) AS n_pts,
       lon - r AS xmin, lat AS ymin, lon + r AS xmax
FROM (SELECT doc_id, lon, lat, (1 + doc_id % 9) / 1e1 AS r FROM {DOCS_GEO_SQL} d)
"""


def q_geo_knn(spark, sf):
    docs = _docs_geo(spark, sf)
    probes = docs.filter("doc_id < 40").select(F.col("doc_id").alias("probe_id"), "lon", "lat")
    out = knn_join(probes, docs, k=5, res=GEO_RES)
    return out.select("probe_id", "doc_id", "dist", F.col("rank").alias("rnk"))


def q_geo_knn_haversine(spark, sf):
    """kNN under the great-circle metric (production geodesy path):
    same expansion loop, haversine distance + per-probe guarantee.
    Output omits the float distance — the oracle compares neighbor SETS
    and ranks, which survive last-ulp libm differences between engines
    (a flip would need two docs within ~1e-15 relative distance)."""
    docs = _docs_geo(spark, sf)
    probes = docs.filter("doc_id < 25").select(F.col("doc_id").alias("probe_id"), "lon", "lat")
    out = knn_join(probes, docs, k=5, res=GEO_RES, metric="haversine")
    return out.select("probe_id", "doc_id", F.col("rank").alias("rnk"))


ORACLE_KNN_HAVERSINE = f"""
WITH pts AS (SELECT * FROM {DOCS_GEO_SQL} d),
probes AS (SELECT doc_id AS probe_id, lon AS plon, lat AS plat FROM pts WHERE doc_id < 25),
pairs AS (
  SELECT p.probe_id, d.doc_id,
         2 * 6371.0088 * asin(sqrt(least(
           sin(radians(d.lat - p.plat) / 2) * sin(radians(d.lat - p.plat) / 2)
           + cos(radians(p.plat)) * cos(radians(d.lat))
             * sin(radians(d.lon - p.plon) / 2) * sin(radians(d.lon - p.plon) / 2), 1.0))) AS dist
  FROM probes p CROSS JOIN pts d),
r AS (SELECT probe_id, doc_id,
             row_number() OVER (PARTITION BY probe_id ORDER BY dist, doc_id) AS rnk FROM pairs)
SELECT probe_id, doc_id, rnk FROM r WHERE rnk <= 5
"""


def q_geo_range_join(spark, sf):
    cover = boxes_cell_cover(spark, _boxes_pd(), res=GEO_RES)
    return bbox_range_join(_docs_geo(spark, sf), cover).select("doc_id", "box_id")


def q_geo_zonal(spark, sf):
    tiles = spark.range(180 * 90).select(
        (F.col("id") % 180 - 90).cast("int").alias("tile_x"),
        (F.col("id") / 180).cast("int").__sub__(F.lit(45)).cast("int").alias("tile_y"),
    )
    tiles = tiles.withColumn(
        "value", ((F.col("tile_x").cast("bigint") * 31 + F.col("tile_y").cast("bigint") * 17) % 97).cast("double")
    )
    tiles = tiles_with_centers(tiles, tile_deg=2.0, res=GEO_RES)
    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    out = zonal_stats(tiles, cover, zone_key="zone_id")
    return out.select(
        "zone_id", "tile_count", "value_sum", F.col("value_mean").alias("value_mean"), "value_min", "value_max"
    )


ORACLE_ZONAL = f"""
WITH tiles AS (
  SELECT tile_x, tile_y,
         CAST((tile_x * 31 + tile_y * 17) % 97 AS DOUBLE) AS value,
         (tile_x + 0.5) * 2.0 AS cx, (tile_y + 0.5) * 2.0 AS cy
  FROM (SELECT unnest(generate_series(-90, 89)) AS tile_x) a
  CROSS JOIN (SELECT unnest(generate_series(-45, 44)) AS tile_y) b
)
SELECT z.zone_id,
       count(*) AS tile_count,
       sum(t.value) AS value_sum,
       sum(t.value) / count(*) AS value_mean,
       min(t.value) AS value_min,
       max(t.value) AS value_max
FROM tiles t JOIN {ZONES_SQL} z
  ON t.cx > z.zx0 AND t.cx < z.zx1 AND t.cy > z.zy0 AND t.cy < z.zy1
GROUP BY z.zone_id
"""


def q_spans_explode(spark, sf):
    """Synthesize interleaved spans from text deterministically, then
    explode back to flat columns — the span-sequence invariant as an
    oracle-checkable query. r8, two plan changes (guide §2.4/§4): the
    demonstration repartition(16) between synthesis and explode was
    pure overhead (an Exchange carrying the heavy array<struct>
    payload at 16 < cores parallelism), and the span fields are now
    computed AFTER exploding the position sequence — whole-stage
    codegen per row — instead of materializing an array of structs
    through the interpreted ``transform`` lambda first (measured
    3.3 s -> 0.5 s at sf1.0, exact parity; the array-building form
    stays exercised by spans_strip_media's filter_spans_kind path)."""
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    ns = F.ceil(F.size(toks) / F.lit(5.0)).cast("int")
    ex = docs.select(
        "doc_id", toks.alias("_toks"), F.posexplode(F.sequence(F.lit(0), ns - 1)).alias("_j", "i")
    )
    is_media = (F.col("doc_id") + F.col("i")) % 4 == 0
    return ex.select(
        "doc_id",
        F.col("i").cast("int").alias("span_idx"),
        F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
        F.when(is_media, F.lit(None).cast("string"))
        .otherwise(F.concat_ws(" ", F.slice(F.col("_toks"), F.col("i") * 5 + 1, 5)))
        .alias("span_text"),
        F.when(
            is_media,
            F.concat(F.lit("media://"), F.col("doc_id").cast("string"), F.lit("/"), F.col("i").cast("string")),
        )
        .otherwise(F.lit(None).cast("string"))
        .alias("media_ref"),
    )


ORACLE_SPANS = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b2 AS (SELECT doc_id, toks, CAST(ceil(len(toks) / 5.0) AS INT) AS ns FROM base),
ex AS (SELECT doc_id, toks, unnest(generate_series(0, ns - 1)) AS i FROM b2)
SELECT doc_id,
       i AS span_idx,
       CASE WHEN (doc_id + i) % 4 = 0 THEN 'media' ELSE 'text' END AS kind,
       CASE WHEN (doc_id + i) % 4 = 0 THEN NULL
            ELSE array_to_string(list_slice(toks, i * 5 + 1, i * 5 + 5), ' ') END AS span_text,
       CASE WHEN (doc_id + i) % 4 = 0 THEN 'media://' || doc_id || '/' || i ELSE NULL END AS media_ref
FROM ex
"""


def q_spans_reconstruct(spark, sf):
    """Interleaved-payload round trip: text -> ordered span chunks ->
    reassembled text. The reconstruction must equal the source
    byte-for-byte (matches=true for every doc) — the operational form
    of the span-sequence invariant. r8: the chunks of one document are
    born in one row, so the round trip is a pure map — the old
    repartition(16) + explode + collect_list/array_sort re-grouping
    re-assembled rows Spark never had to take apart (an Exchange of the
    whole span payload plus an ObjectHashAggregate, at 16 < cores
    parallelism). The sort-by-offset invariant is preserved: spans are
    reassembled through the same array_sort-by-offset path, just
    without leaving the row (guide §2.4)."""
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    ns = F.ceil(F.size(toks) / F.lit(5.0)).cast("int")
    docs = docs.withColumn("_toks", toks).withColumn("_ns", ns)
    spans = F.transform(
        F.sequence(F.lit(0), F.col("_ns") - 1),
        lambda i: F.struct(
            i.cast("int").alias("o"),
            F.concat_ws(" ", F.slice(F.col("_toks"), i * 5 + 1, 5)).alias("t"),
        ),
    )
    rec = docs.select(
        "doc_id",
        F.col("text").alias("_orig"),
        F.array_join(F.transform(F.array_sort(spans), lambda x: x["t"]), " ").alias("_rec"),
    )
    return rec.select(
        "doc_id", (F.col("_rec") == F.col("_orig")).alias("matches"), F.md5("_rec").alias("digest")
    )


ORACLE_SPANS_RECONSTRUCT = """
WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
b2 AS (SELECT doc_id, text, toks, CAST(ceil(len(toks) / 5.0) AS INT) AS ns FROM base),
ex AS (SELECT doc_id, text, array_to_string(list_slice(toks, i * 5 + 1, i * 5 + 5), ' ') AS st, i
       FROM (SELECT doc_id, text, toks, unnest(generate_series(0, ns - 1)) AS i FROM b2)),
rec AS (SELECT doc_id, any_value(text) AS orig, string_agg(st, ' ' ORDER BY i) AS r FROM ex GROUP BY doc_id)
SELECT doc_id, (r = orig) AS matches, md5(r) AS digest FROM rec
"""


# ============================================================ dedup queries

def q_dedup_exact(spark, sf):
    return exact_dedup(spark.read.parquet(f"{sf}/documents.parquet"))


def q_minhash_signatures(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    sig = minhash_signature(docs.select("doc_id", "text"), n_hashes=8)
    return sig.select("doc_id", *[F.element_at("sig", i + 1).alias(f"h{i}") for i in range(8)])


def _oracle_sig_cte(n_hashes: int) -> str:
    # mirrors minhash_signature: one md5 per shingle, h_i = min(a + i*b)
    hcols = ",\n    ".join(f"min(a + {i} * b) AS h{i}" for i in range(n_hashes))
    return f"""
tok AS (SELECT doc_id, string_split(lower(text), ' ') AS tokens FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(tokens) >= 3
              THEN list_transform(range(1, len(tokens) - 1), i -> array_to_string(list_slice(tokens, i, i + 2), ' '))
              ELSE [array_to_string(tokens, ' ')] END AS shingles
       FROM tok),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
ab AS (SELECT doc_id,
         ('0x' || substring(md5(s), 1, 15))::BIGINT AS a,
         ('0x' || substring(md5(s), 17, 14))::BIGINT AS b
       FROM ex),
sig AS (SELECT doc_id, {hcols} FROM ab GROUP BY doc_id)"""


ORACLE_MINHASH_SIG = "WITH " + _oracle_sig_cte(8) + "\nSELECT * FROM sig"


def q_minhash_lsh_pairs(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return minhash_lsh_pairs(docs, n_hashes=16, bands=4, threshold=0.5, max_bucket=64)


def _oracle_minhash_pairs() -> str:
    n, bands, rows = 16, 4, 4
    band_key = " ".join(
        "WHEN %d THEN md5(concat_ws(',', %s))" % (b, ", ".join(f"h{b * rows + r}" for r in range(rows)))
        for b in range(bands)
    )
    matches = " + ".join(f"(a.h{i} = b.h{i})::INT" for i in range(n))
    return f"""WITH {_oracle_sig_cte(n)},
banded AS (
  SELECT doc_id, {', '.join(f'h{i}' for i in range(n))}, band,
         CASE band {band_key} END AS band_key
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS band)
  QUALIFY row_number() OVER (PARTITION BY band, band_key ORDER BY doc_id) <= 64
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, ({matches}) / 16.0 AS est_jaccard
FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE ({matches}) / 16.0 >= 0.5"""


def q_simhash(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return simhash_column(docs, use_md5=True)


def _oracle_simhash() -> str:
    votes = ",\n    ".join(
        f"sum(CASE WHEN (hh >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}" for b in range(60)
    )
    recompose = " + ".join(f"CASE WHEN b{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END" for b in range(60))
    return f"""WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tokk FROM documents),
h AS (SELECT doc_id, ('0x' || substring(md5(tokk), 1, 15))::BIGINT AS hh FROM tok),
votes AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id)
SELECT doc_id, ({recompose}) AS simhash FROM votes"""


def q_ngram_jaccard(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return ngram_jaccard_pairs(docs, threshold=0.6)


def _oracle_ngram() -> str:
    # mirrors the rebuilt ngram_jaccard_pairs: candidates = banded
    # MinHash LSH buckets (capped at 64), exact Jaccard verify >= 0.6
    n, bands, rows = 16, 4, 4
    band_key = " ".join(
        "WHEN %d THEN md5(concat_ws(',', %s))" % (b, ", ".join(f"h{b * rows + r}" for r in range(rows)))
        for b in range(bands)
    )
    return f"""WITH {_oracle_sig_cte(n)},
banded AS (
  SELECT doc_id, {', '.join(f'h{i}' for i in range(n))}, band,
         CASE band {band_key} END AS band_key
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS band)
  QUALIFY row_number() OVER (PARTITION BY band, band_key ORDER BY doc_id) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh)
SELECT c.doc_a, c.doc_b,
       len(list_intersect(x.s, y.s)) / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS jaccard
FROM cand c JOIN sets x ON x.doc_id = c.doc_a JOIN sets y ON y.doc_id = c.doc_b
WHERE len(list_intersect(x.s, y.s)) / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) >= 0.6"""


def q_winnow_fingerprints(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return winnow_fingerprints(docs, k=8, window=16, use_md5=True)


ORACLE_WINNOW = """
WITH g AS (
  SELECT doc_id, p,
         ('0x' || substring(md5(substring(text, p, 8)), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p FROM documents))
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
FROM g
"""


def q_fingerprint_overlap(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return fingerprint_overlap_pairs(docs, k=8, window=16, min_shared=2, use_md5=True)


ORACLE_FP_OVERLAP = """
WITH g AS (
  SELECT doc_id, p,
         ('0x' || substring(md5(substring(text, p, 8)), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p FROM documents)),
fps AS (
  SELECT DISTINCT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
  FROM g),
capped AS (
  SELECT doc_id, fp FROM fps
  QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) <= 64)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_fps
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_decontaminate_fuzzy(spark, sf):
    """Fuzzy decontamination: flag corpus docs whose MinHash signature
    shares any LSH band with a benchmark doc — catches high-Jaccard
    near-verbatim contamination the exact winnowing pass can miss
    after small edits. Composes the committed minhash machinery
    (operators/dedup.py) across TWO tables (corpus x benchmark,
    benchmark side broadcast) instead of a self-join; shared_bands =
    bands matched (each corpus doc carries one row per band, bench
    keys are distinct, so the count is exact)."""
    n_hashes, bands = 16, 4
    rows = n_hashes // bands
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    sig = minhash_signature(docs.select("doc_id", "text"), n_hashes=n_hashes).cache()

    def banded(s):
        return s.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.md5(
                                F.concat_ws(
                                    ",", *[F.element_at("sig", b * rows + r + 1) for r in range(rows)]
                                )
                            ).alias("band_key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))

    bench = banded(sig.filter("doc_id < 5")).select("band", "band_key").distinct()
    corpus = banded(sig.filter("doc_id >= 5"))
    hits = corpus.join(F.broadcast(bench), ["band", "band_key"])
    return hits.groupBy("doc_id").agg(F.count("*").alias("shared_bands"))


def _oracle_decontaminate_fuzzy() -> str:
    n, bands, rows = 16, 4, 4
    band_key = " ".join(
        "WHEN %d THEN md5(concat_ws(',', %s))" % (b, ", ".join(f"h{b * rows + r}" for r in range(rows)))
        for b in range(bands)
    )
    return f"""WITH {_oracle_sig_cte(n)},
banded AS (
  SELECT doc_id, band, CASE band {band_key} END AS band_key
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, {bands - 1})) AS band)
),
bench AS (SELECT DISTINCT band, band_key FROM banded WHERE doc_id < 5),
corpus AS (SELECT * FROM banded WHERE doc_id >= 5)
SELECT corpus.doc_id, COUNT(*) AS shared_bands
FROM corpus JOIN bench USING (band, band_key)
GROUP BY corpus.doc_id"""


def q_stratified_sample(spark, sf):
    """Exact-count stratified sample: exactly min(20, |stratum|) docs
    per (lang, source) stratum, deterministically ordered by
    md5(doc_id) — content-stable eval-set construction (re-runs and
    resumes pick identical docs). Parallelism = number of strata (each
    stratum's rank is one window partition); at corpus scale strata
    are lang x source x quality-bucket = thousands of partitions, so
    no single-reducer bottleneck unless one stratum dominates — then
    pre-cut by hash before ranking."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang", "source", "rn")
    )


ORACLE_STRATIFIED_SAMPLE = """
SELECT doc_id, lang, source, rn FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 20
"""


def q_decontaminate(spark, sf):
    """Benchmark decontamination — the canonical training-data use of
    winnowing: flag corpus documents sharing any >= (window+k-1)-char
    passage with a (small, broadcast) benchmark set. Benchmark = docs
    with doc_id < 5; result = contaminated corpus docs with the shared-
    fingerprint count."""
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    # cache: bench and corpus sides otherwise re-execute the winnow
    # lineage each (in production the fingerprint table is persisted)
    fps = winnow_fingerprints(docs, k=8, window=16, use_md5=True).cache()
    bench = fps.filter("doc_id < 5").select(F.col("fp").alias("bfp")).distinct()
    corpus = fps.filter("doc_id >= 5")
    hits = corpus.join(F.broadcast(bench), corpus.fp == bench.bfp)
    return hits.groupBy("doc_id").agg(F.count_distinct("fp").alias("shared_fps"))


ORACLE_DECONTAMINATE = """
WITH g AS (
  SELECT doc_id, p,
         ('0x' || substring(md5(substring(text, p, 8)), 1, 15))::BIGINT AS h
  FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p FROM documents)),
fps AS (
  SELECT DISTINCT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY p ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
  FROM g),
bench AS (SELECT DISTINCT fp FROM fps WHERE doc_id < 5)
SELECT c.doc_id, count(DISTINCT c.fp) AS shared_fps
FROM fps c JOIN bench b ON c.fp = b.fp
WHERE c.doc_id >= 5
GROUP BY c.doc_id
"""


def q_dedup_components(spark, sf):
    """Near-dup clustering: connected components over the MinHash-LSH
    pair graph (hash-min label propagation) — the stage that turns
    pairwise near-dups into keep-one-per-cluster decisions. Oracle:
    DuckDB recursive CTE computing min reachable id per node over the
    same LSH edges."""
    from pyogrio_spark.operators.dedup import connected_components

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, n_hashes=16, bands=4, threshold=0.5, max_bucket=64).select("doc_a", "doc_b")
    return connected_components(pairs).select(F.col("node").alias("doc_id"), "comp")


def _oracle_components() -> str:
    pairs = _oracle_minhash_pairs()
    return f"""WITH RECURSIVE pairs AS ({pairs}),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs),
nodes AS (SELECT DISTINCT src AS node FROM sym),
reach(node, r) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT re.node, e.dst FROM reach re JOIN sym e ON e.src = re.r)
SELECT node AS doc_id, min(r) AS comp FROM reach GROUP BY node"""


def q_text_features(spark, sf):
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")).alias("fingerprint_md5")
    return docs.select(
        "doc_id", token_count(), word_piece_count(), lang_id(), F.round(quality_score(), 6).alias("quality"), fp
    )


def q_text_tfidf(spark, sf):
    """Top-5 tf-idf terms per document (functions/text.py
    tfidf_top_terms): integer-only tie-safe ranking, score rounded to
    6 decimals — exact across engines."""
    from pyogrio_spark.functions.text import tfidf_top_terms

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return tfidf_top_terms(docs, k=5)


ORACLE_TEXT_TFIDF = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dfq AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
         round(tf.tf * ln((n.n_docs + 1) / (dfq.df + 1)), 6) AS tfidf,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf DESC, dfq.df ASC, tf.token ASC
         ) AS rnk
  FROM tf JOIN dfq USING (token) CROSS JOIN n
)
SELECT doc_id, token, tf, df, tfidf, rnk FROM scored WHERE rnk <= 5
"""


def q_chunk_pack_global(spark, sf):
    """Cross-document global packing (operators/chunking.py
    pack_chunks_global): two-phase distributed rank — range shuffle,
    partition-local row_number + broadcast offsets; no corpus-sized
    single window task."""
    from pyogrio_spark.operators.chunking import chunk_documents, pack_chunks_global

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    ch = chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)
    return pack_chunks_global(ch, budget_tokens=128, chunk_tokens=32).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "global_idx",
        "pack_id",
    )


ORACLE_CHUNK_PACK_GLOBAL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), e AS (
  SELECT doc_id, n,
         unnest(range(0, greatest(1, CAST(ceil((n - 32) / 24.0) AS INT) + 1))) AS chunk_id
  FROM n
), g AS (
  SELECT doc_id, chunk_id, least(32, n - chunk_id * 24) AS n_tokens,
         row_number() OVER (ORDER BY doc_id, chunk_id) - 1 AS global_idx
  FROM e
)
SELECT doc_id, chunk_id, n_tokens, global_idx,
       CAST(floor(global_idx / 4) AS BIGINT) AS pack_id
FROM g
"""


def q_text_lm_score(spark, sf):
    """Corpus-trained bigram LM quality scores (functions/text.py
    bigram_lm_scores): add-one smoothing, mean bigram log-prob per doc,
    rounded 6 decimals."""
    from pyogrio_spark.functions.text import bigram_lm_scores

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return bigram_lm_scores(docs)


ORACLE_TEXT_LM_SCORE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, toks FROM t WHERE len(toks) >= 2
), e AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
  FROM m
), big AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM e
), c2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1
), v AS (
  SELECT COUNT(*) AS v FROM (
    SELECT DISTINCT w FROM (SELECT w1 AS w FROM big UNION ALL SELECT w2 FROM big)
  )
), s AS (
  SELECT big.doc_id, ln((c2.c2 + 1) / (c1.c1 + v.v)) AS lp
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
)
SELECT doc_id, COUNT(*) AS n_bigrams, round(avg(lp), 6) AS lm_score
FROM s GROUP BY doc_id
"""


def q_text_chunking(spark, sf):
    """Fixed-window chunking + capacity packing (operators/chunking.py):
    32-token windows sliding by 24 (8-token overlap), packed 4 chunks /
    128-token budget. Zero-shuffle map stage — the plan a 100 TB corpus
    runs."""
    from pyogrio_spark.operators.chunking import chunk_documents, pack_chunks

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    ch = chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)
    return pack_chunks(ch, budget_tokens=128, chunk_tokens=32).select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "chunk_text",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "pack_id",
    )


ORACLE_TEXT_CHUNKING = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), e AS (
  SELECT doc_id, toks, n,
         unnest(range(0, greatest(1, CAST(ceil((n - 32) / 24.0) AS INT) + 1))) AS chunk_id
  FROM n
)
SELECT doc_id,
       chunk_id,
       array_to_string(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32], ' ') AS chunk_text,
       least(32, n - chunk_id * 24) AS n_tokens,
       CAST(floor(chunk_id / 4) AS BIGINT) AS pack_id
FROM e
"""


def _oracle_text_features() -> str:
    lang_scores = ",\n    ".join(
        "len(list_intersect(list_distinct(toks200), [%s])) AS s_%s"
        % (", ".join(f"'{w}'" for w in words), lang)
        for lang, words in LANG_PROFILES.items()
    )
    # tie-break mirrors Spark's array_max over struct(score, lang):
    # highest score, then lexicographically greatest lang
    pred = (
        "CASE WHEN greatest(s_en, s_es, s_fr, s_de, s_zh) = 0 THEN 'und' "
        "WHEN s_zh = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'zh' "
        "WHEN s_fr = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'fr' "
        "WHEN s_es = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'es' "
        "WHEN s_en = greatest(s_en, s_es, s_fr, s_de, s_zh) THEN 'en' "
        "ELSE 'de' END"
    )
    en_words = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         string_split_regex(trim(text), '\\s+') AS toks,
         list_slice(string_split_regex(lower(text), '\\s+'), 1, 200) AS toks200
  FROM documents),
feat AS (
  SELECT doc_id, text, n_chars, toks,
         len(toks) AS token_count,
         len(regexp_extract_all(text, '\\w+')) + len(regexp_extract_all(text, '[^\\w\\s]')) AS word_piece_count,
         {lang_scores},
         len(regexp_extract_all(text, '[A-Za-z]')) / greatest(n_chars, 1) AS alpha_ratio,
         len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(n_chars, 1) AS punct_ratio,
         n_chars / greatest(len(toks), 1) AS mean_wlen,
         len(list_intersect(list_distinct(list_transform(toks, t -> lower(t))), [{en_words}])) AS stop_hits
  FROM base)
SELECT doc_id, token_count, word_piece_count,
       {pred} AS lang_pred,
       round(
         (CASE WHEN token_count >= 10 AND token_count <= 10000 THEN 1.0 ELSE 0.3 END) * 0.3
         + (CASE WHEN mean_wlen >= 2.5 AND mean_wlen <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
         + (CASE WHEN stop_hits >= 2 THEN 1.0 ELSE 0.5 END) * 0.2
         + least(alpha_ratio * 1.25, 1.0) * 0.2
         + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.1, 6) AS quality,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint_md5
FROM feat"""


# ======================================================= similarity queries

def q_sim_topk(spark, sf):
    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    probes = emb.filter("vec_id < 10").select(F.col("vec_id").alias("probe_id"), "embedding")
    out = cosine_topk_bruteforce(emb, probes, k=5)
    return out.select("probe_id", "vec_id", F.col("rank").alias("rnk"))


ORACLE_SIM_TOPK = """
WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 10),
pairs AS (
  SELECT p.probe_id, e.vec_id,
         list_inner_product(p.pe, e.embedding)
           / (sqrt(list_inner_product(p.pe, p.pe)) * sqrt(list_inner_product(e.embedding, e.embedding))) AS cos
  FROM probes p CROSS JOIN embeddings e),
r AS (SELECT probe_id, vec_id, row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS rnk FROM pairs)
SELECT probe_id, vec_id, rnk FROM r WHERE rnk <= 5
"""


def q_ivf_topk(spark, sf):  # rows-only check (approximate by design)
    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    cents = make_centroids(64, 8)
    bucketed = ivf_assign(emb, cents)
    probes = emb.filter("vec_id < 10").select(F.col("vec_id").alias("probe_id"), "embedding")
    return ivf_topk(bucketed, probes, cents, k=5, nprobe=4).select("probe_id", "vec_id", "rank")


def q_adaptive_tile_map(spark, sf):
    docs = _docs_geo(spark, sf)
    tmap = adaptive_tiles(docs, base_res=3, max_res=9, target_rows=200, lon_col="lon", lat_col="lat")
    return spark.createDataFrame(tmap, schema="tile_id long, res int, row_count long")


def _oracle_adaptive(base: int = 3, maxr: int = 9, target: int = 200) -> str:
    """Exact SQL for adaptive_tiles: the split loop has a fixed small
    depth (base..maxr), so it unrolls into chained CTEs — r{k} is the
    frontier at res k (cells whose parent frontier cell exceeded the
    target), finals are frontier cells at/below the target plus the
    ENTIRE max-res frontier (the operator adds the last frontier
    unconditionally). A cell's docs all share one parent cell, so
    restricting counts to hot parents never changes a count — the join
    condition alone reproduces the engine's restricted re-aggregation."""

    def cell(r: int) -> str:
        return cell_expr_sql("lon", "lat", r)

    parts = [f"WITH d AS (SELECT lon, lat FROM {DOCS_GEO_SQL} dd)"]
    parts.append(f", c{base} AS (SELECT {cell(base)} AS cell, count(*) AS n FROM d GROUP BY 1)")
    for r in range(base + 1, maxr + 1):
        parts.append(
            f", c{r} AS (SELECT {cell(r)} AS cell, {cell(r - 1)} AS parent, count(*) AS n "
            f"FROM d GROUP BY 1, 2)"
        )
    parts.append(f", r{base} AS (SELECT cell, n FROM c{base})")
    for r in range(base + 1, maxr + 1):
        parts.append(
            f", r{r} AS (SELECT c{r}.cell, c{r}.n FROM c{r} "
            f"JOIN r{r - 1} p ON c{r}.parent = p.cell AND p.n > {target})"
        )
    sel = [
        f"SELECT cell AS tile_id, {r} AS res, CAST(n AS BIGINT) AS row_count "
        f"FROM r{r} WHERE n <= {target}"
        for r in range(base, maxr)
    ]
    sel.append(
        f"SELECT cell AS tile_id, {maxr} AS res, CAST(n AS BIGINT) AS row_count FROM r{maxr}"
    )
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(sel)


def q_media_video_frames(spark, sf):
    """REAL video path, fully oracle-checked: media spans -> deterministic
    Y4M payloads (valid YUV4MPEG2 streams) -> actual container walk
    (header tokens, FRAME markers) sampling every 2nd frame up to 4 per
    asset -> per-frame mean luma. Constant-luma frames make every
    feature closed-form in SQL (mean == luma exactly: g*n/n is
    IEEE-exact)."""
    from pyogrio_spark.operators.multimodal import extract_video_frames

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    ns = F.least(F.ceil(F.size(toks) / F.lit(20.0)).cast("int"), F.lit(4))
    spans = F.transform(
        F.sequence(F.lit(0), ns - 1),
        lambda i: F.struct(
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), F.col("doc_id").cast("string"), F.lit("/"), i.cast("string")).alias(
                "media_ref"
            ),
            i.cast("int").alias("offset"),
        ),
    )
    with_spans = docs.select("doc_id", spans.alias("spans"))
    return extract_video_frames(with_spans, every_n=2, max_frames=4)


ORACLE_VIDEO = """
WITH base AS (
  SELECT doc_id, least(CAST(ceil(len(string_split(text, ' ')) / 2e1) AS INT), 4) AS ns FROM documents),
spans AS (
  SELECT doc_id, unnest(generate_series(0, ns - 1)) AS i FROM base),
media AS (SELECT doc_id, i FROM spans WHERE (doc_id + i) % 3 = 0),
params AS (
  SELECT doc_id, i,
         8 + 2 * ((doc_id * 3 + i) % 12) AS w,
         8 + 2 * ((doc_id * 5 + i) % 8) AS h,
         4 + (doc_id + i) % 8 AS nf
  FROM media),
frames AS (
  SELECT doc_id, i, w, h, nf, unnest(generate_series(0, 3)) AS slot FROM params)
SELECT doc_id,
       'media://' || doc_id || '/' || i AS media_ref,
       CAST(i AS INT) AS span_offset,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(nf AS INT) AS n_frames,
       CAST(slot * 2 AS INT) AS frame_index,
       CAST((doc_id * 7 + i * 11 + slot * 2 * 13) % 256 AS DOUBLE) AS mean_luma
FROM frames WHERE slot * 2 < nf
"""


def q_media_audio_features(spark, sf):
    """REAL media decode path, fully oracle-checked: media spans ->
    deterministic WAV payloads (valid RIFF/PCM16 files) -> actual codec
    parse (chunk walk, PCM read) -> rate / samples / duration / RMS.
    Constant-amplitude synthesis makes every feature closed-form in SQL:
    rms == amplitude exactly (n*a^2/n and sqrt(a^2) are IEEE-exact)."""
    from pyogrio_spark.operators.multimodal import extract_audio_features

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    ns = F.least(F.ceil(F.size(toks) / F.lit(20.0)).cast("int"), F.lit(4))
    spans = F.transform(
        F.sequence(F.lit(0), ns - 1),
        lambda i: F.struct(
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), F.col("doc_id").cast("string"), F.lit("/"), i.cast("string")).alias(
                "media_ref"
            ),
            i.cast("int").alias("offset"),
        ),
    )
    with_spans = docs.select("doc_id", spans.alias("spans"))
    return extract_audio_features(with_spans)


ORACLE_AUDIO = """
WITH base AS (
  SELECT doc_id, least(CAST(ceil(len(string_split(text, ' ')) / 2e1) AS INT), 4) AS ns FROM documents),
spans AS (
  SELECT doc_id, unnest(generate_series(0, ns - 1)) AS i FROM base),
media AS (SELECT doc_id, i FROM spans WHERE (doc_id + i) % 3 = 0)
SELECT doc_id,
       'media://' || doc_id || '/' || i AS media_ref,
       CAST(i AS INT) AS span_offset,
       CAST(8000 AS INT) AS sample_rate,
       CAST(64 + (doc_id + i) % 64 AS BIGINT) AS n_samples,
       CAST((64 + (doc_id + i) % 64) * 1000 AS DOUBLE) / 8000 AS duration_ms,
       CAST(1000 + (doc_id * 31 + i * 7) % 20000 AS DOUBLE) AS rms
FROM media
"""


def q_media_image_features(spark, sf):
    """REAL image decode path, fully oracle-checked: media spans fetch
    deterministic valid PGM (P5) payloads; a genuine netpbm parser reads
    header + raster into width/height/maxval/mean. Constant-gray
    synthesis makes every feature closed-form in SQL (mean == gray
    exactly)."""
    from pyogrio_spark.operators.multimodal import extract_image_features

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    ns = F.least(F.ceil(F.size(toks) / F.lit(20.0)).cast("int"), F.lit(4))
    spans = F.transform(
        F.sequence(F.lit(0), ns - 1),
        lambda i: F.struct(
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), F.col("doc_id").cast("string"), F.lit("/"), i.cast("string")).alias(
                "media_ref"
            ),
            i.cast("int").alias("offset"),
        ),
    )
    with_spans = docs.select("doc_id", spans.alias("spans"))
    return extract_image_features(with_spans)


ORACLE_IMAGE = """
WITH base AS (
  SELECT doc_id, least(CAST(ceil(len(string_split(text, ' ')) / 2e1) AS INT), 4) AS ns FROM documents),
spans AS (
  SELECT doc_id, unnest(generate_series(0, ns - 1)) AS i FROM base),
media AS (SELECT doc_id, i FROM spans WHERE (doc_id + i) % 3 = 0)
SELECT doc_id,
       'media://' || doc_id || '/' || i AS media_ref,
       CAST(i AS INT) AS span_offset,
       CAST(8 + (doc_id * 3 + i) % 24 AS INT) AS width,
       CAST(8 + (doc_id * 5 + i) % 16 AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST((doc_id * 7 + i * 11) % 256 AS DOUBLE) AS mean_luma
FROM media
"""


def q_media_resize(spark, sf):
    """REAL image resize, oracle-checked: decode PGM -> nearest-neighbor
    downsample to max side 16 -> re-encode -> features of the thumbnail.
    Constant-gray synthesis keeps mean_luma exact; resized dims are
    integer arithmetic ((side*16) // max(w,h), never upsampled)."""
    from pyogrio_spark.operators.multimodal import resize_images

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    ns = F.least(F.ceil(F.size(toks) / F.lit(20.0)).cast("int"), F.lit(4))
    spans = F.transform(
        F.sequence(F.lit(0), ns - 1),
        lambda i: F.struct(
            F.when((F.col("doc_id") + i) % 3 == 0, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("media://"), F.col("doc_id").cast("string"), F.lit("/"), i.cast("string")).alias(
                "media_ref"
            ),
            i.cast("int").alias("offset"),
        ),
    )
    with_spans = docs.select("doc_id", spans.alias("spans"))
    return resize_images(with_spans, max_side=16)


ORACLE_RESIZE = """
WITH base AS (
  SELECT doc_id, least(CAST(ceil(len(string_split(text, ' ')) / 2e1) AS INT), 4) AS ns FROM documents),
spans AS (SELECT doc_id, unnest(generate_series(0, ns - 1)) AS i FROM base),
media AS (
  SELECT doc_id, i,
         8 + (doc_id * 3 + i) % 24 AS w,
         8 + (doc_id * 5 + i) % 16 AS h
  FROM spans WHERE (doc_id + i) % 3 = 0)
SELECT doc_id,
       'media://' || doc_id || '/' || i AS media_ref,
       CAST(i AS INT) AS span_offset,
       CAST(CASE WHEN greatest(w, h) <= 16 THEN w ELSE (w * 16) // greatest(w, h) END AS INT) AS width,
       CAST(CASE WHEN greatest(w, h) <= 16 THEN h ELSE (h * 16) // greatest(w, h) END AS INT) AS height,
       CAST(255 AS INT) AS maxval,
       CAST((doc_id * 7 + i * 11) % 256 AS DOUBLE) AS mean_luma
FROM media
"""


def q_ivf_topk_full(spark, sf):
    """IVF with nprobe = n_centroids: every bucket is scanned, so the
    result is provably EXACT top-k — the full oracle covers the whole
    IVF machinery (assignment, bucket join, rank); the pruned-nprobe
    recall is gated separately in tests/test_similarity.py."""
    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    cents = make_centroids(64, 8)
    bucketed = ivf_assign(emb, cents)
    probes = emb.filter("vec_id < 10").select(F.col("vec_id").alias("probe_id"), "embedding")
    return ivf_topk(bucketed, probes, cents, k=5, nprobe=8).select(
        "probe_id", "vec_id", F.col("rank").alias("rnk")
    )


def q_geo_measures(spark, sf):
    """GeoSeries.area/.length/.centroid over the 200 synthesized zone
    rectangles: the engine parses the zone WKB and runs the planar
    measure kernels (geometry/measure.py); the oracle computes the same
    quantities from the rectangles' closed-form corner expressions.
    Rounded to 7 decimals: shoelace vs product differ only in the last
    couple of double bits."""
    from pyogrio_spark.functions.geo import measure_columns

    zones = spark.createDataFrame(
        _zones_pd(), schema="zone_id bigint, geometry_wkb binary"
    )
    m = measure_columns(zones)
    return m.select(
        "zone_id",
        F.round("area", 7).alias("area_r"),
        F.round("length", 7).alias("len_r"),
        F.round("cx", 7).alias("cx_r"),
        F.round("cy", 7).alias("cy_r"),
    )


def q_geo_measures_geodesic(spark, sf):
    """Spherical area + great-circle perimeter of the zone rectangles
    (geodesic measures for lon/lat data). The spherical-excess edge sum
    and haversine edge lengths have closed forms for graticule-aligned
    rects — the oracle evaluates those; rounded (km²/km, 3 decimals)
    for trig last-bit + summation-order differences."""
    from pyogrio_spark.functions.geo import measure_geodesic_columns

    zones = spark.createDataFrame(
        _zones_pd(), schema="zone_id bigint, geometry_wkb binary"
    )
    m = measure_geodesic_columns(zones)
    return m.select(
        "zone_id",
        F.round(F.col("area_m2") / 1e6, 3).alias("area_km2_r"),
        F.round(F.col("length_m") / 1e3, 3).alias("perim_km_r"),
    )


def q_geo_areal_interpolate(spark, sf):
    """Area-weighted areal interpolation of the 200 zone rectangles
    onto res-5 grid tiles (value = zone_id + 1 redistributed by
    intersection area). Engine: codegen candidate enumeration + the
    rect-clip kernel; oracle: closed-form rect-overlap areas per
    (zone, tile). Rounded to 5 decimals (per-tile sums of ≤4 terms,
    engine-order vs SQL-order summation differs in the last bits)."""
    from pyogrio_spark.operators.zonal import areal_interpolate

    zones = spark.createDataFrame(
        _zones_pd(), schema="zone_id bigint, geometry_wkb binary"
    ).withColumn("val", (F.col("zone_id") + 1).cast("double"))
    out = areal_interpolate(zones, "val", res=5)
    return out.select("tile_id", F.round("value", 5).alias("value_r"))


def q_geo_within_distance(spark, sf):
    """Bounded-distance join (geopandas sjoin dwithin): all (probe, doc)
    pairs under 2.000003 planar degrees (radius offset off the 1e-5
    coordinate grid so no pair sits exactly on the boundary). One-shot
    cell-window plan; oracle is the naive cross-join distance filter."""
    from pyogrio_spark.operators.knn import within_distance_join

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    d = docs.selectExpr(
        "doc_id", f"{LON_EXPR} AS xmin", f"{LAT_EXPR} AS ymin"
    ).withColumn("cell_id", F.expr(cell_expr_sql("xmin", "ymin", GEO_RES)))
    probes = d.filter("doc_id < 40").selectExpr(
        "doc_id AS probe_id", "xmin AS lon", "ymin AS lat"
    )
    return within_distance_join(probes, d, radius=2.000003, res=GEO_RES)


def q_geo_clip(spark, sf):
    """clip_by_rect of the 200 zone rectangles against a fixed window:
    the engine runs the Sutherland-Hodgman kernel; rect-by-rect clip
    has a closed-form answer (interval intersection), which is the
    oracle. Zones that miss the window drop (inner join semantics)."""
    from pyogrio_spark.functions.geo import clip_by_rect_column, measure_columns

    WX0, WY0, WX1, WY1 = -50.0, -40.0, 70.0, 60.0
    zones = spark.createDataFrame(
        _zones_pd(), schema="zone_id bigint, geometry_wkb binary"
    )
    clipped = zones.withColumn(
        "geometry_wkb", clip_by_rect_column(WX0, WY0, WX1, WY1)
    ).filter(F.col("geometry_wkb").isNotNull())
    m = measure_columns(clipped)
    return m.select(
        "zone_id",
        F.round("area", 7).alias("area_r"),
        F.round("cx", 7).alias("cx_r"),
        F.round("cy", 7).alias("cy_r"),
    )


def q_geo_reproject(spark, sf):
    """GeoSeries.to_crs(3857) for the closed-form Web-Mercator pair —
    pure CODEGEN expressions on the point coordinate columns (no
    Python); the oracle evaluates the identical published formula.
    Rounded to 4 decimals (0.1 mm): JVM vs libm ln/tan differ in the
    last ulp."""
    from pyogrio_spark.functions.geo import mercator_x_expr, mercator_y_expr

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    d = docs.selectExpr("doc_id", f"{LON_EXPR} AS lon", f"{LAT_EXPR} AS lat")
    return d.select(
        "doc_id",
        F.round(mercator_x_expr("lon"), 4).alias("mx"),
        F.round(mercator_y_expr("lat"), 4).alias("my"),
    )


def q_ivf2_topk_full(spark, sf):
    """TWO-LEVEL IVF (coarse + shared residual fine codebook — the
    C >> 256 scale architecture: n_coarse*n_fine effective cells for
    n_coarse+n_fine dots per row) with every bucket probed: provably
    exact, so the brute-force oracle covers the whole two-level
    machinery (train, residual assignment, bucket join, rank); pruned
    probing is recall-gated in tests/test_similarity.py."""
    from pyogrio_spark.operators.similarity import ivf2_assign, ivf2_topk, ivf2_train

    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    coarse, fine = ivf2_train(emb, dim=64, n_coarse=4, n_fine=4, iters=1)
    bucketed = ivf2_assign(emb, coarse, fine)
    probes = emb.filter("vec_id < 10").select(F.col("vec_id").alias("probe_id"), "embedding")
    return ivf2_topk(
        bucketed, probes, coarse, fine, k=5, nprobe_coarse=4, nprobe_fine=4
    ).select("probe_id", "vec_id", F.col("rank").alias("rnk"))


def q_ivf2pq_topk_full(spark, sf):
    """IVF-PQ (coarse cells + product-quantized residuals + ADC lookup
    scoring — the classic IVFADC layout; the round-4 verdict's flagged
    next ANN pressure point): with every coarse cell probed and
    rerank=None (exact cosine over every candidate) the result is
    provably exact, so the brute-force oracle covers the whole
    machinery (coarse train, PQ codebook train, residual encoding, the
    per-probe ADC LUT, candidate join, rank). ADC-pruned search is
    recall-gated vs plain ivf2 at equal exact-dot budget in
    tests/test_similarity.py."""
    from pyogrio_spark.operators.similarity import (
        ivf_train,
        ivfpq_assign,
        ivfpq_topk,
        pq_train,
    )

    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    coarse = ivf_train(emb, dim=64, n_centroids=4, iters=1)
    books = pq_train(emb, coarse, dim=64, m=4, k_sub=8, iters=1)
    coded = ivfpq_assign(emb, coarse, books)
    probes = emb.filter("vec_id < 10").select(F.col("vec_id").alias("probe_id"), "embedding")
    return ivfpq_topk(coded, probes, coarse, books, k=5, nprobe=4, rerank=None).select(
        "probe_id", "vec_id", F.col("rank").alias("rnk")
    )


def q_events_asof_rates(spark, sf):
    """AS-OF join (the classic missing Spark operator, distributed
    two-phase plan): every event picks the latest per-type 'rate' row at
    or before its timestamp. Rates: one row per (event_type, hour) on a
    deterministic arithmetic grid; DuckDB's native ASOF JOIN is the
    oracle. Timestamps compared as epoch-microsecond bigints (tz-proof,
    see events_sessionize)."""
    from pyogrio_spark.operators.asof_join import asof_join_distributed

    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_id", "event_type",
        F.expr("timestampdiff(MICROSECOND, timestamp_ntz'2024-01-01 00:00:00', ts)").alias("tus"),
    )
    types = ev.select("event_type").distinct()
    rates = (
        spark.range(0, 2401).select(F.col("id").cast("int").alias("h"))
        .crossJoin(types)
        .select(
            "event_type",
            (F.col("h").cast("bigint") * F.lit(3600000000).cast("bigint")).alias("rts_us"),
            (((F.col("h") * 13 + F.length("event_type") * 7) % 1000).cast("double") / F.expr("1e1")).alias("rate"),
        )
    )
    out = asof_join_distributed(
        ev, rates, ["event_type"], left_ts="tus", right_ts="rts_us", right_vals=["rate"], num_partitions=32
    )
    return out.select("event_id", "rate")


ORACLE_ASOF = """
WITH rates AS (
  SELECT t.event_type, h,
         CAST(h AS BIGINT) * 3600000000 AS rts_us,
         CAST((h * 13 + length(t.event_type) * 7) % 1000 AS DOUBLE) / 1e1 AS rate
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(generate_series(0, 2400)) AS h)),
ev AS (SELECT event_id, event_type,
              epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00') AS tus FROM events)
SELECT e.event_id, r.rate
FROM ev e ASOF JOIN rates r ON e.event_type = r.event_type AND e.tus >= r.rts_us
"""


# ============================================================= sql / events

def q_tpch_q1(spark, sf):
    _register_views(spark, sf, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf):
    _register_views(spark, sf, ("lineitem", "orders", "customer"))
    return spark.sql(
        """
        SELECT o.o_orderkey,
               CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               o.o_orderdate
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
        """
    )


ORACLE_Q3 = """
SELECT o.o_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_region_rollup(spark, sf):
    _register_views(spark, sf, ("customer", "nation", "region"))
    return spark.sql(
        """
        SELECT r_name, count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )


ORACLE_REGION = """
SELECT r_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_events_hourly(spark, sf):
    _register_views(spark, sf, ("events",))
    return spark.sql(
        """
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS n_events,
               round(sum(value), 3) AS value_sum,
               min(value) AS value_min, max(value) AS value_max
        FROM events GROUP BY 1, 2
        """
    )


ORACLE_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events,
       round(sum(value), 3) AS value_sum,
       min(value) AS value_min, max(value) AS value_max
FROM events GROUP BY 1, 2
"""


def q_events_sessionize(spark, sf):
    _register_views(spark, sf, ("events",))
    return spark.sql(
        """
        WITH l AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR timestampdiff(MICROSECOND, lag(ts) OVER w, ts) > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (
          SELECT user_id, ts,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM l)
        SELECT user_id, sess_id,
               timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', min(ts)) AS session_start_us,
               timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', max(ts)) AS session_end_us,
               count(*) AS n_events
        FROM s GROUP BY user_id, sess_id
        """
    )


# Gap test and session bounds in epoch-MICROseconds on both engines so
# fractional-second timestamps can neither diverge on the 1800 s boundary
# nor hash differently in the driver's canonicalization.
ORACLE_SESSIONIZE = """
WITH l AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
  FROM l)
SELECT user_id, sess_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, sess_id
"""


def q_read_bounds(spark, sf):
    """read_bounds surface (envelope-only scan, 5-column projection)."""
    from pyogrio_spark.io.reader import read_bounds

    return read_bounds(spark, _docs_geo(spark, sf))


def q_total_bounds(spark, sf):
    """extent aggregate (reference get_total_bounds, _io.pyx:584-610)."""
    docs = _docs_geo(spark, sf)
    return docs.agg(
        F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
        F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax"),
        F.count("*").alias("n"),
    )


def q_events_json_props(spark, sf):
    """JSON field parse (reference OFSTJSON -> json.loads, geopandas.py:508-518)."""
    _register_views(spark, sf, ("events",))
    return spark.sql(
        """
        SELECT cast(get_json_object(props, '$.k') as bigint) AS k,
               count(*) AS n_events,
               min(event_id) AS first_event
        FROM events GROUP BY 1
        """
    )


def q_geo_curation(spark, sf):
    """END-TO-END geo training-data pipeline in ONE oracled query:
    documents -> PIP zone assignment (broadcast cell join + rect
    shortcut) -> per-zone exact dedup (keep first doc per content per
    zone) -> per-zone token budget (first-fit cumulative cut over
    doc_id order, budget_filter_window semantics) -> per-zone kept
    counts + token totals. Exercises geo join + dedup + budget
    composition through the engine operators."""
    from pyogrio_spark.operators.budget import budget_filter_window

    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    joined = point_in_polygon_join(
        _docs_geo(spark, sf), cover, zone_key="zone_id", keep_doc_cols=["doc_id"]
    )
    docs = _read_spread(spark, f"{sf}/documents.parquet").select("doc_id", "text")
    d = joined.join(docs, "doc_id").withColumn("_tok", token_count())
    w = Window.partitionBy("zone_id", F.md5("text")).orderBy("doc_id")
    deduped = d.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")
    budgeted = budget_filter_window(
        deduped, budget=2000, group_col="zone_id", value_col="_tok", order_cols=("doc_id",)
    )
    return budgeted.groupBy("zone_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("_tok").alias("tokens"),
        F.min("doc_id").alias("first_doc"),
    )


ORACLE_GEO_CURATION = f"""
WITH pip AS (
  SELECT d.doc_id, z.zone_id FROM {DOCS_GEO_SQL} d JOIN {ZONES_SQL} z
  ON d.lon > z.zx0 AND d.lon < z.zx1 AND d.lat > z.zy0 AND d.lat < z.zy1),
j AS (
  SELECT p.zone_id, p.doc_id, len(string_split(doc.text, ' ')) AS tok, doc.text
  FROM pip p JOIN documents doc ON doc.doc_id = p.doc_id),
dd AS (
  SELECT * FROM (
    SELECT zone_id, doc_id, tok,
           row_number() OVER (PARTITION BY zone_id, md5(text) ORDER BY doc_id) AS rn
    FROM j) WHERE rn = 1),
cum AS (
  SELECT zone_id, doc_id, tok,
         sum(tok) OVER (PARTITION BY zone_id ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS c
  FROM dd)
SELECT zone_id, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tokens,
       min(doc_id) AS first_doc
FROM cum WHERE c - tok < 2000
GROUP BY zone_id
"""


def q_corpus_curation(spark, sf):
    """Composed training-data pipeline: exact-dedup -> quality gate ->
    language filter -> per-language token budget accounting. One query
    exercising dedup + text features + aggregation together."""
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    w = F.row_number().over(Window.partitionBy(fp).orderBy("doc_id"))
    deduped = docs.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")
    kept = deduped.filter(F.round(quality_score(), 6) >= 0.5).filter(F.col("lang").isin("en", "es", "fr"))
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count()).alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


ORACLE_CURATION = f"""
WITH fp AS (
  SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f,
         row_number() OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                            ORDER BY doc_id) AS rn
  FROM documents),
dd AS (SELECT * FROM fp WHERE rn = 1),
q AS (
  SELECT doc_id, lang, text,
         len(string_split_regex(trim(text), '\\s+')) AS token_count,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) AS alpha_ratio,
         len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) AS punct_ratio,
         length(text) / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS mean_wlen,
         len(list_intersect(list_distinct(list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t))),
             [{', '.join("'" + w + "'" for w in LANG_PROFILES['en'])}])) AS stop_hits
  FROM dd),
scored AS (
  SELECT doc_id, lang, token_count,
         round(
           (CASE WHEN token_count >= 10 AND token_count <= 10000 THEN 1.0 ELSE 0.3 END) * 0.3
           + (CASE WHEN mean_wlen >= 2.5 AND mean_wlen <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
           + (CASE WHEN stop_hits >= 2 THEN 1.0 ELSE 0.5 END) * 0.2
           + least(alpha_ratio * 1.25, 1.0) * 0.2
           + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.1, 6) AS quality
  FROM q)
SELECT lang, count(*) AS n_docs, CAST(sum(token_count) AS BIGINT) AS total_tokens, min(doc_id) AS first_doc
FROM scored WHERE quality >= 0.5 AND lang IN ('en', 'es', 'fr')
GROUP BY lang
"""


def q_dataset_split(spark, sf):
    """Deterministic train/val/test assignment by content-stable md5
    bucketing — per (lang, split) counts. Pure codegen, no shuffle
    before the aggregate."""
    from pyogrio_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = hash_split(docs, key_col="doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1})
    return out.groupBy("lang", "split").agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))


ORACLE_SPLIT = """
SELECT lang,
       CASE WHEN b < 800000 THEN 'train' WHEN b < 900000 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n_docs, min(doc_id) AS first_doc
FROM (SELECT lang, doc_id,
             ('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS b
      FROM documents)
GROUP BY 1, 2
"""


def q_domain_mix(spark, sf):
    """Domain mixing: deterministically resample the corpus to target
    per-language weights (en x1.5 upsampled, others subsampled) — each
    group-g row appears floor(w) times plus one extra iff its content
    hash falls under frac(w). Output: per (lang, copy_idx) counts."""
    from pyogrio_spark.operators.sampling import resample_to_weights

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = resample_to_weights(docs, {"en": 1.5, "es": 0.5, "fr": 0.5, "de": 0.5, "zh": 0.5}, group_col="lang")
    return out.groupBy("lang", "copy_idx").agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))


ORACLE_DOMAIN_MIX = """
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5('mix' || doc_id), 1, 15))::BIGINT % 1000000 AS bucket
  FROM documents),
n AS (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN 1 + CASE WHEN bucket < 500000 THEN 1 ELSE 0 END
              ELSE 0 + CASE WHEN bucket < 500000 THEN 1 ELSE 0 END END AS nc
  FROM b),
ex AS (SELECT doc_id, lang, unnest(generate_series(0, nc - 1)) AS copy_idx FROM n WHERE nc > 0)
SELECT lang, copy_idx, count(*) AS n_docs, min(doc_id) AS first_doc
FROM ex GROUP BY lang, copy_idx
"""


def q_token_budget(spark, sf):
    """Per-language token-budget selection via the distributed prefix
    sum (two-phase, no single-reducer window) — longest docs first."""
    from pyogrio_spark.operators.budget import budget_filter

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    docs = docs.withColumn("token_count", token_count())
    # longest-first order needs an ascending sortable column for the range shuffle
    docs = docs.withColumn("neg_tokens", -F.col("token_count"))
    kept = budget_filter(
        docs, budget=5000, group_col="lang", value_col="token_count",
        order_cols=("neg_tokens", "doc_id"), num_partitions=16,
    ).drop("neg_tokens")
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("token_count").alias("tokens_kept"),
        F.min("doc_id").alias("first_doc"),
    )


ORACLE_BUDGET = """
WITH t AS (
  SELECT lang, doc_id, len(string_split_regex(trim(text), '\\s+')) AS token_count
  FROM documents),
c AS (
  SELECT lang, doc_id, token_count,
         sum(token_count) OVER (PARTITION BY lang ORDER BY token_count DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT lang, count(*) AS n_docs, CAST(sum(token_count) AS BIGINT) AS tokens_kept, min(doc_id) AS first_doc
FROM c WHERE cum - token_count < 5000
GROUP BY lang
"""


# ---------------------------------------------------------------- tokenizer

# Fixed subword vocab for the driver queries: every character the
# corpus uses (segmentation is total by construction — no UNK branch)
# plus multi-char subwords chosen so greedy maximal-munch produces
# multi-token words with interesting longest-match decisions
# ("table" -> tab+le, "customer" -> cu+sto+mer, "merge" -> mer+g+e
# because "mer" outranks "me" at position 1).
TOKENIZER_VOCAB = sorted(
    set("abcdefghijklmnopqrstuvwy")
    | {
        "tab", "le", "val", "ue", "wind", "ow", "sc", "an", "row", "or",
        "der", "so", "rt", "str", "eam", "qu", "ery", "gr", "oup", "ha",
        "sh", "jo", "in", "key", "li", "ne", "me", "rge", "pa", "fa",
        "st", "sl", "sm", "all", "ba", "tch", "big", "col", "umn", "cu",
        "sto", "mer", "da", "ta", "fil", "ter", "dup", "agg", "the",
        "vec", "tor", "spa", "rk", "que",
    }
)

_VOCAB_VALUES = ", ".join(f"('{t}')" for t in TOKENIZER_VOCAB)

# greedy longest-match segmentation of every distinct word as a
# recursive CTE: the longest vocab prefix at a position is the match
# with NO longer vocab prefix (NOT EXISTS — aggregates are illegal in
# a recursive member); one deterministic successor per state so the
# recursion is a chain, exactly the operator's loop.
_SEG_CTE = f"""vocab(tok) AS (VALUES {_VOCAB_VALUES}),
wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
words AS (SELECT doc_id, unnest(l) AS word,
                 unnest(generate_series(1, length(l))) - 1 AS word_idx FROM wl),
dwords AS (SELECT DISTINCT word FROM words),
seg(word, pos, tok) AS (
    SELECT dw.word, 1, v.tok
    FROM dwords dw JOIN vocab v
      ON substr(dw.word, 1, length(v.tok)) = v.tok
     AND NOT EXISTS (SELECT 1 FROM vocab v2
                     WHERE length(v2.tok) > length(v.tok)
                       AND substr(dw.word, 1, length(v2.tok)) = v2.tok)
  UNION ALL
    SELECT s.word, s.pos + length(s.tok), v.tok
    FROM seg s JOIN vocab v
      ON s.pos + length(s.tok) <= length(s.word)
     AND substr(s.word, s.pos + length(s.tok), length(v.tok)) = v.tok
     AND NOT EXISTS (SELECT 1 FROM vocab v2
                     WHERE length(v2.tok) > length(v.tok)
                       AND substr(s.word, s.pos + length(s.tok), length(v2.tok)) = v2.tok)
)"""


def q_text_tokenize(spark, sf):
    """Greedy longest-match subword segmentation (WordPiece-style
    maximal munch) against the fixed vocab — distinct words segmented
    once in a single Arrow-batched pass, routed back to the corpus
    (operators/tokenizer.py). One row per subword token occurrence."""
    from pyogrio_spark.operators.tokenizer import tokenize_greedy

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return tokenize_greedy(docs, TOKENIZER_VOCAB)


ORACLE_TEXT_TOKENIZE = f"""WITH RECURSIVE {_SEG_CTE}
SELECT w.doc_id, w.word_idx, s.pos AS tok_pos, s.tok AS token
FROM words w JOIN seg s ON w.word = s.word"""

_BPE_MERGES = 8


def _oracle_bpe_ctes(k: int) -> str:
    """Unrolled BPE training rounds: w0 = char-split distinct words with
    corpus frequencies; each round materializes the argmax pair (ties
    on pair ascending) and the merged symbol strings. MATERIALIZED is
    load-bearing — inlined CTEs re-evaluate w{{r-1}} per reference and
    the chain goes exponential."""
    parts = [
        """w0 AS MATERIALIZED (
  SELECT word, n, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
  FROM (SELECT w AS word, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE length(w) > 0 GROUP BY w))"""
    ]
    for r in range(1, k + 1):
        parts.append(f"""b{r} AS MATERIALIZED (
  SELECT s1, s2, CAST(sum(n) AS BIGINT) AS freq FROM (
    SELECT n, unnest(l[1:length(l)-1]) AS s1, unnest(l[2:length(l)]) AS s2
    FROM (SELECT n, string_split(trim(sym), ' ') AS l FROM w{r - 1}))
  GROUP BY s1, s2 ORDER BY freq DESC, s1, s2 LIMIT 1)""")
        parts.append(f"""w{r} AS MATERIALIZED (
  SELECT word, n, replace(sym, ' ' || b.s1 || ' ' || b.s2 || ' ',
                          ' ' || b.s1 || b.s2 || ' ') AS sym
  FROM w{r - 1} CROSS JOIN b{r} b)""")
    return ",\n".join(parts)


def q_bpe_train_merges(spark, sf):
    """Distributed BPE merge training (operators/tokenizer.py): one
    pair-count aggregation per merge over the distinct-word table, a
    single argmax row collected per round, codegen string-replace to
    apply each merge. Returns the codebook-sized merge table."""
    from pyogrio_spark.operators.tokenizer import train_bpe_merges

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    merges = train_bpe_merges(docs, num_merges=_BPE_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, freq bigint"
    )


ORACLE_BPE_TRAIN = (
    "WITH "
    + _oracle_bpe_ctes(_BPE_MERGES)
    + "\n"
    + " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, s1 AS lhs, s2 AS rhs, freq FROM b{r}"
        for r in range(1, _BPE_MERGES + 1)
    )
)


def q_text_bpe_apply(spark, sf):
    """Train 8 BPE merges on the corpus, then apply them as ONE codegen
    projection (chained string replaces over sentinel-delimited symbol
    strings) on the distinct-word table, hash-joined back to the word
    stream. One row per BPE token occurrence."""
    from pyogrio_spark.operators.tokenizer import apply_bpe_merges, train_bpe_merges

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    merges = train_bpe_merges(docs, num_merges=_BPE_MERGES)
    return apply_bpe_merges(docs, [(l, r) for _, l, r, _ in merges])


ORACLE_BPE_APPLY = (
    "WITH "
    + _oracle_bpe_ctes(_BPE_MERGES)
    + f""",
wl AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
wds AS (SELECT doc_id, unnest(l) AS word,
               unnest(generate_series(1, length(l))) - 1 AS word_idx FROM wl),
toks AS (SELECT word, unnest(tl) AS token,
                unnest(generate_series(1, length(tl))) - 1 AS tok_idx
         FROM (SELECT word, string_split(trim(sym), ' ') AS tl FROM w{_BPE_MERGES}))
SELECT w.doc_id, w.word_idx, t.tok_idx, t.token
FROM wds w JOIN toks t ON w.word = t.word"""
)


def q_token_budget_subword(spark, sf):
    """Token-budget selection metered in TOKENIZER tokens: per-doc
    subword counts under greedy segmentation (distinct-word counts
    hash-joined back), then the two-phase distributed prefix sum —
    the real-pipeline version of token_budget (which meters whitespace
    words)."""
    from pyogrio_spark.operators.budget import budget_filter
    from pyogrio_spark.operators.tokenizer import subword_token_counts

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    cnt = subword_token_counts(docs, TOKENIZER_VOCAB, count_col="token_count")
    docs = docs.select("doc_id", "lang").join(cnt, "doc_id")
    docs = docs.withColumn("neg_tokens", -F.col("token_count"))
    kept = budget_filter(
        docs, budget=5000, group_col="lang", value_col="token_count",
        order_cols=("neg_tokens", "doc_id"), num_partitions=16,
    ).drop("neg_tokens")
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("token_count").cast("bigint").alias("tokens_kept"),
        F.min("doc_id").alias("first_doc"),
    )


ORACLE_BUDGET_SUBWORD = f"""WITH RECURSIVE {_SEG_CTE},
wtok AS (SELECT word, count(*) AS nt FROM seg GROUP BY word),
cnt AS (SELECT w.doc_id, CAST(sum(t.nt) AS BIGINT) AS token_count
        FROM words w JOIN wtok t ON w.word = t.word GROUP BY w.doc_id),
t AS (SELECT d.lang, d.doc_id, c.token_count
      FROM documents d JOIN cnt c ON d.doc_id = c.doc_id),
c AS (SELECT lang, doc_id, token_count,
             sum(token_count) OVER (PARTITION BY lang ORDER BY token_count DESC, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
SELECT lang, count(*) AS n_docs, CAST(sum(token_count) AS BIGINT) AS tokens_kept,
       min(doc_id) AS first_doc
FROM c WHERE cum - token_count < 5000
GROUP BY lang"""


# ----------------------------------------------------------------- SemDeDup

_SEMDEDUP_EPS = "3e-1"
_SEMDEDUP_CAP = 16


def q_semdedup_exact(spark, sf):
    """SemDeDup (operators/similarity.py semantic_dedup): k-means
    cluster the embeddings (seeded codebook — the deterministic twin
    of ivf_train, same assignment expression), remove every vector
    with an earlier same-cluster neighbor above the cosine threshold.
    Exact within-cluster pairs; returns the kept set."""
    from pyogrio_spark.operators.similarity import make_centroids, semantic_dedup

    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    cents = make_centroids(64, 8)
    return semantic_dedup(emb, cents, threshold=float(_SEMDEDUP_EPS))


def q_semdedup_pruned(spark, sf):
    """Pruned SemDeDup twin: only the first probe_cap items per cluster
    (by key) act as removers — per-cluster cost linear in cap x size,
    the 100 TB path for skewed clusters. The cap rule is deterministic,
    so this variant is fully oracled too (QUALIFY row cap), unlike
    pruned-nprobe IVF whose probe choice is score-dependent."""
    from pyogrio_spark.operators.similarity import make_centroids, semantic_dedup

    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    cents = make_centroids(64, 8)
    return semantic_dedup(
        emb, cents, threshold=float(_SEMDEDUP_EPS), probe_cap=_SEMDEDUP_CAP
    )


def _oracle_semdedup(probe_cap: int | None = None) -> str:
    """Mirror of semantic_dedup with the seeded codebook inlined as
    literals: same argmax assignment (first-max tie rule in both
    engines), same double-cast cosine (bit-parity verified), same
    earlier-neighbor NOT EXISTS rule."""
    from pyogrio_spark.operators.similarity import make_centroids

    cents = make_centroids(64, 8)
    def lit(row):
        return "[" + ",".join(repr(float(x)) for x in row) + "]::DOUBLE[]"

    scores = ", ".join(
        f"list_inner_product(CAST(embedding AS DOUBLE[]), {lit(cents[i])})"
        " / greatest(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),"
        " CAST(embedding AS DOUBLE[]))), 1e-12)"
        for i in range(cents.shape[0])
    )
    removers = "assigned"
    cap_cte = ""
    if probe_cap is not None:
        cap_cte = f""",
removers AS (
  SELECT * FROM assigned
  QUALIFY row_number() OVER (PARTITION BY ivf_bucket ORDER BY vec_id) <= {probe_cap})"""
        removers = "removers"
    return f"""
WITH assigned AS MATERIALIZED (
  SELECT vec_id, CAST(list_position(s, list_max(s)) - 1 AS INTEGER) AS ivf_bucket,
         CAST(embedding AS DOUBLE[]) AS v
  FROM (SELECT vec_id, embedding, [{scores}] AS s FROM embeddings)){cap_cte}
SELECT x.vec_id, x.ivf_bucket FROM assigned x
WHERE NOT EXISTS (
  SELECT 1 FROM {removers} y
  WHERE y.ivf_bucket = x.ivf_bucket AND y.vec_id < x.vec_id
    AND list_inner_product(x.v, y.v)
        / (sqrt(list_inner_product(x.v, x.v)) * sqrt(list_inner_product(y.v, y.v)))
        >= {_SEMDEDUP_EPS})"""


# ------------------------------------------------------- repetition filters

_REP_LINE_WORDS = 8


def q_text_repetition(spark, sf):
    """Gopher-style repetition quality filters (functions/text.py
    repetition_scores): top-2/3/4-gram word mass, duplicate-5-gram
    occurrence fraction, and duplicate-line fractions over fixed
    8-word segments (the corpus is single-line). All codegen: one
    token explode, per-doc lead windows, one aggregation tree."""
    from pyogrio_spark.functions.text import repetition_scores

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return repetition_scores(docs, line_words=_REP_LINE_WORDS)


_REP_CTE = f"""toks AS (
  SELECT doc_id, unnest(l) AS w, unnest(generate_series(1, length(l))) - 1 AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
nw AS (SELECT doc_id, count(*) AS n_words FROM toks GROUP BY doc_id),
led AS (SELECT doc_id, i, w,
        lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w1,
        lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
        lead(w, 3) OVER (PARTITION BY doc_id ORDER BY i) AS w3,
        lead(w, 4) OVER (PARTITION BY doc_id ORDER BY i) AS w4
        FROM toks),
grams AS (
  SELECT doc_id, 2 AS n, w || ' ' || w1 AS g FROM led WHERE w1 IS NOT NULL
  UNION ALL
  SELECT doc_id, 3, w || ' ' || w1 || ' ' || w2 FROM led WHERE w2 IS NOT NULL
  UNION ALL
  SELECT doc_id, 4, w || ' ' || w1 || ' ' || w2 || ' ' || w3 FROM led WHERE w3 IS NOT NULL
  UNION ALL
  SELECT doc_id, 5, w || ' ' || w1 || ' ' || w2 || ' ' || w3 || ' ' || w4
  FROM led WHERE w4 IS NOT NULL),
per AS (SELECT doc_id, n, max(c) AS mx, sum(c) AS tot,
               sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
        FROM (SELECT doc_id, n, g, count(*) AS c FROM grams GROUP BY 1, 2, 3)
        GROUP BY 1, 2),
lines AS (SELECT doc_id, i // {_REP_LINE_WORDS} AS li, string_agg(w, ' ' ORDER BY i) AS line
          FROM toks GROUP BY doc_id, i // {_REP_LINE_WORDS}),
lst AS (SELECT doc_id,
               round(sum(CASE WHEN c > 1 THEN c ELSE 0 END) / CAST(sum(c) AS DOUBLE), 6) AS dup_line_frac,
               round(sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) / CAST(sum(c * len) AS DOUBLE), 6) AS dup_line_char_frac
        FROM (SELECT doc_id, line, count(*) AS c, length(line) AS len
              FROM lines GROUP BY doc_id, line)
        GROUP BY doc_id),
rep AS (
  SELECT n.doc_id, n.n_words,
         round(p2.mx * 2 / CAST(n.n_words AS DOUBLE), 6) AS top2_frac,
         round(p3.mx * 3 / CAST(n.n_words AS DOUBLE), 6) AS top3_frac,
         round(p4.mx * 4 / CAST(n.n_words AS DOUBLE), 6) AS top4_frac,
         round(p5.dup / CAST(p5.tot AS DOUBLE), 6) AS dup5_frac,
         l.dup_line_frac, l.dup_line_char_frac
  FROM nw n
  JOIN per p2 ON n.doc_id = p2.doc_id AND p2.n = 2
  JOIN per p3 ON n.doc_id = p3.doc_id AND p3.n = 3
  JOIN per p4 ON n.doc_id = p4.doc_id AND p4.n = 4
  JOIN per p5 ON n.doc_id = p5.doc_id AND p5.n = 5
  JOIN lst l ON n.doc_id = l.doc_id)"""

ORACLE_TEXT_REPETITION = f"WITH {_REP_CTE}\nSELECT * FROM rep"


def q_corpus_curation_rep(spark, sf):
    """Pretraining filter stack v2: exact-dedup (keep first) ->
    quality gate -> REPETITION gate (Gopher top-2-gram mass +
    duplicate-5-gram fraction) -> language filter -> per-language
    accounting. Extends corpus_curation with the repetition_scores
    composition."""
    from pyogrio_spark.functions.text import repetition_scores

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    w = F.row_number().over(Window.partitionBy(fp).orderBy("doc_id"))
    deduped = docs.withColumn("_rn", w).filter(F.col("_rn") == 1).drop("_rn")
    rep = repetition_scores(docs, line_words=_REP_LINE_WORDS).select(
        "doc_id", "top2_frac", "dup5_frac"
    )
    kept = (
        deduped.join(rep, "doc_id")
        .filter(F.round(quality_score(), 6) >= 0.5)
        .filter(F.col("lang").isin("en", "es", "fr"))
        .filter((F.col("top2_frac") <= F.lit(8e-2)) & (F.col("dup5_frac") <= F.lit(1e-2)))
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count()).alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


ORACLE_CURATION_REP = f"""
WITH {_REP_CTE},
fp AS (
  SELECT *, row_number() OVER (PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                               ORDER BY doc_id) AS rn
  FROM documents),
dd AS (SELECT * FROM fp WHERE rn = 1),
q AS (
  SELECT doc_id, lang, text,
         len(string_split_regex(trim(text), '\\s+')) AS token_count,
         len(regexp_extract_all(text, '[A-Za-z]')) / greatest(length(text), 1) AS alpha_ratio,
         len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(length(text), 1) AS punct_ratio,
         length(text) / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS mean_wlen,
         len(list_intersect(list_distinct(list_transform(string_split_regex(trim(text), '\\s+'), t -> lower(t))),
             [{', '.join("'" + w + "'" for w in LANG_PROFILES['en'])}])) AS stop_hits
  FROM dd),
scored AS (
  SELECT doc_id, lang, token_count,
         round(
           (CASE WHEN token_count >= 10 AND token_count <= 10000 THEN 1.0 ELSE 0.3 END) * 0.3
           + (CASE WHEN mean_wlen >= 2.5 AND mean_wlen <= 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
           + (CASE WHEN stop_hits >= 2 THEN 1.0 ELSE 0.5 END) * 0.2
           + least(alpha_ratio * 1.25, 1.0) * 0.2
           + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.1, 6) AS quality
  FROM q)
SELECT s.lang, count(*) AS n_docs, CAST(sum(s.token_count) AS BIGINT) AS total_tokens,
       min(s.doc_id) AS first_doc
FROM scored s JOIN rep r ON s.doc_id = r.doc_id
WHERE s.quality >= 0.5 AND s.lang IN ('en', 'es', 'fr')
  AND r.top2_frac <= 8e-2 AND r.dup5_frac <= 1e-2
GROUP BY s.lang
"""


def q_window_top_orders_per_segment(spark, sf):
    """window-function surface: top-3 orders by price per market segment."""
    _register_views(spark, sf, ("orders", "customer"))
    return spark.sql(
        """
        WITH j AS (
          SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
          SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM j) WHERE rnk <= 3
        """
    )


_LINE_DEDUP_WORDS = 8


def q_dedup_lines_global(spark, sf):
    """Corpus-global line-level exact dedup (operators/dedup.py
    line_dedup_global — the C4 / Lee-et-al pipeline stage): every
    duplicate occurrence of an 8-word line across the corpus is
    dropped except the first (by (doc_id, line) order), documents
    reassembled from surviving lines. Zero-shuffle segmentation via
    chunk_documents; keeper decision is a bigint min over md5(line)."""
    from pyogrio_spark.operators.dedup import line_dedup_global

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return line_dedup_global(docs, line_words=_LINE_DEDUP_WORDS)


_SPAN_DEDUP_WINDOW = 10


def q_dedup_spans_global(spark, sf):
    """Corpus-global exact substring dedup (operators/dedup.py
    span_dedup_global — the Lee-et-al suffix-array stage at fixed
    match width): every 10-token sliding span duplicated anywhere in
    the corpus is cut at token granularity except its first
    occurrence (by (doc_id, pos)), documents reassembled from
    surviving tokens. Gram stream + content-hash bigint-min keeper —
    no suffix array, no all-pairs."""
    from pyogrio_spark.operators.dedup import span_dedup_global

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return span_dedup_global(docs, window_tokens=_SPAN_DEDUP_WINDOW)


ORACLE_DEDUP_SPANS_GLOBAL = f"""
WITH s AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
toks AS (
  SELECT doc_id, unnest(l) AS w, unnest(generate_series(1, length(l))) - 1 AS i
  FROM s),
g AS (
  SELECT doc_id, unnest(generate_series(0, length(l) - {_SPAN_DEDUP_WINDOW})) AS p, l
  FROM s WHERE length(l) >= {_SPAN_DEDUP_WINDOW}),
grams AS (
  SELECT doc_id, p, array_to_string(l[p + 1 : p + {_SPAN_DEDUP_WINDOW}], ' ') AS gram
  FROM g),
keep AS (SELECT gram, min(doc_id * 1048576 + p) AS keeper FROM grams GROUP BY gram),
dup AS (
  SELECT gr.doc_id, gr.p FROM grams gr JOIN keep k
  ON gr.gram = k.gram AND gr.doc_id * 1048576 + gr.p <> k.keeper),
cov AS (
  SELECT DISTINCT doc_id, off FROM (
    SELECT doc_id, unnest(generate_series(p, p + {_SPAN_DEDUP_WINDOW} - 1)) AS off
    FROM dup)),
kept AS (
  SELECT t.doc_id, t.i, t.w FROM toks t LEFT JOIN cov c
  ON t.doc_id = c.doc_id AND t.i = c.off WHERE c.doc_id IS NULL),
nt AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
reb AS (
  SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text, count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT n.doc_id, coalesce(r.text, '') AS text,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       coalesce(r.n_kept, 0) AS n_kept
FROM nt n LEFT JOIN reb r USING (doc_id)
"""


ORACLE_DEDUP_LINES_GLOBAL = f"""
WITH toks AS (
  SELECT doc_id, unnest(l) AS w, unnest(generate_series(1, length(l))) - 1 AS i
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)),
segs AS (
  SELECT doc_id, i // {_LINE_DEDUP_WORDS} AS li, string_agg(w, ' ' ORDER BY i) AS line
  FROM toks GROUP BY doc_id, i // {_LINE_DEDUP_WORDS}),
keep AS (
  SELECT line, min(doc_id * 1048576 + li) AS keeper FROM segs GROUP BY line),
kept AS (
  SELECT s.doc_id, s.li, s.line FROM segs s JOIN keep k
  ON s.line = k.line AND s.doc_id * 1048576 + s.li = k.keeper),
nl AS (SELECT doc_id, count(*) AS n_lines FROM segs GROUP BY doc_id),
reb AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY li) AS text, count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT n.doc_id, coalesce(r.text, '') AS text,
       CAST(n.n_lines AS INTEGER) AS n_lines,
       coalesce(r.n_kept, 0) AS n_kept
FROM nl n LEFT JOIN reb r USING (doc_id)
"""


def q_quality_percentile(spark, sf):
    """CCNet-style perplexity-percentile gate: bigram-LM score the
    corpus (bigram_lm_scores, already hash-green), keep documents at
    or above the 0.7 percent-rank of their language (operators/
    sampling.py percentile_filter). Exact and tie-stable: ranks on the
    ROUNDED score so both engines rank the identical key. Scale note
    in the operator docstring — the exact gate is a per-group sort;
    the approx twin (percentile_filter_approx, two-phase sketch +
    broadcast threshold) is the 100 TB path, band-gated in pytest."""
    from pyogrio_spark.functions.text import bigram_lm_scores
    from pyogrio_spark.operators.sampling import percentile_filter

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    scored = bigram_lm_scores(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return percentile_filter(scored, "lm_score", 0.7, group_col="lang").select(
        "doc_id", "lang", F.col("n_bigrams"), "lm_score", "pct_rank"
    )


# same bigram-LM CTE stack as ORACLE_TEXT_LM_SCORE (kept verbatim — the
# LM score must be the identical rounded key both gates rank on),
# followed by the per-language percent_rank gate
ORACLE_QUALITY_PERCENTILE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), m AS (
  SELECT doc_id, toks FROM t WHERE len(toks) >= 2
), e AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
  FROM m
), big AS (
  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM e
), c2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1
), v AS (
  SELECT COUNT(*) AS v FROM (
    SELECT DISTINCT w FROM (SELECT w1 AS w FROM big UNION ALL SELECT w2 FROM big)
  )
), s AS (
  SELECT big.doc_id, ln((c2.c2 + 1) / (c1.c1 + v.v)) AS lp
  FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
), lm AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, round(avg(lp), 6) AS lm_score
  FROM s GROUP BY doc_id
), scored AS (
  SELECT l.doc_id, d.lang, l.n_bigrams, l.lm_score
  FROM lm l JOIN documents d USING (doc_id)
), r AS (
  SELECT doc_id, lang, n_bigrams, lm_score,
         round(percent_rank() OVER (PARTITION BY lang ORDER BY lm_score), 9) AS pct_rank
  FROM scored)
SELECT doc_id, lang, n_bigrams, lm_score, pct_rank FROM r WHERE pct_rank >= 0.7
"""


# ================================================================= registry

# ------------------------------------------------------ corpus scrubbing
#
# Round-6 additions: the cleaning stages of a pretraining pipeline
# (normalize -> redact -> URL hygiene -> benchmark decontamination),
# functions/scrub.py. The synthetic corpus contains none of these
# patterns, so each query AUGMENTS the text deterministically from
# doc_id — the identical expression on both engines — and the oracle
# compares the scrubbed result exactly (md5 of the output text is the
# hard signal).

# the normalization mess: tab + typographic junk + doc-varying space
# run + a control char. Shared constant so the Spark and SQL builds
# cannot drift.
_MESS = " “q”—x… "


def q_text_normalize(spark, sf):
    """Text normalization (functions/scrub.py normalize_text):
    control-strip, typographic fold (curly quotes/dashes/ellipsis/NBSP
    -> ASCII), whitespace-run collapse, trim. Zero-shuffle map stage;
    output keyed by md5 of the normalized text."""
    from pyogrio_spark.functions.scrub import normalize_text

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    aug = F.concat(
        F.col("text"),
        F.lit("\t" + _MESS),
        F.expr("repeat(' ', cast(doc_id % 3 + 1 as int))"),
        F.lit("\x01end"),
    )
    norm = normalize_text(aug)
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(aug).alias("n_raw"),
        F.length(norm).alias("n_norm"),
    )


def _oracle_text_normalize() -> str:
    from pyogrio_spark.functions.scrub import normalize_sql

    aug = (
        f"text || chr(9) || '{_MESS}' || repeat(' ', CAST(doc_id % 3 + 1 AS INT))"
        " || chr(1) || 'end'"
    )
    return f"""
SELECT doc_id, md5({normalize_sql(f"({aug})")}) AS norm_md5,
       length({aug}) AS n_raw, length({normalize_sql(f"({aug})")}) AS n_norm
FROM documents"""


def q_text_pii_redact(spark, sf):
    """PII redaction (functions/scrub.py redact_pii): emails, phone
    numbers (dash and dot forms), IPv4 addresses -> typed placeholder
    tokens, with pre-redaction audit counts. The PII is planted
    deterministically from doc_id (presence varies by doc so counts
    are non-constant); md5 of the redacted text pins replacement
    positions exactly. Pure map stage — regexp codegen, zero shuffle."""
    from pyogrio_spark.functions.scrub import pii_counts, redact_pii

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    aug = F.concat(
        F.col("text"),
        F.when(
            d % 3 != 0,
            F.concat(F.lit(" reach user"), s(d), F.lit("@mail-"), s(d % 5), F.lit(".example.com")),
        ).otherwise(F.lit("")),
        F.concat(F.lit(" call 415-555-"), F.lpad(s(d % 10000), 4, "0")),
        F.when(
            d % 2 == 0,
            F.concat(F.lit(" alt 212.555."), F.lpad(s((d * 7) % 10000), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 != 1,
            F.concat(F.lit(" from 10."), s(d % 256), F.lit(".0."), s(d % 100)),
        ).otherwise(F.lit("")),
    )
    counts = pii_counts(aug)
    red = redact_pii(aug)
    return docs.select(
        "doc_id",
        *[v.alias(k) for k, v in counts.items()],
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("n_chars_red"),
    )


def _oracle_text_pii() -> str:
    from pyogrio_spark.functions.scrub import EMAIL_RE, IPV4_RE, PHONE_RE, redact_sql

    aug = (
        "text"
        " || CASE WHEN doc_id % 3 <> 0 THEN ' reach user' || doc_id || '@mail-'"
        " || (doc_id % 5) || '.example.com' ELSE '' END"
        " || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
        " || CASE WHEN doc_id % 2 = 0 THEN ' alt 212.555.'"
        " || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || CASE WHEN doc_id % 4 <> 1 THEN ' from 10.' || (doc_id % 256)"
        " || '.0.' || (doc_id % 100) ELSE '' END"
    )
    return f"""
WITH a AS (SELECT doc_id, ({aug}) AS t FROM documents)
SELECT doc_id,
       len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(t, '{IPV4_RE}')) AS n_ips,
       md5({redact_sql("t")}) AS redacted_md5,
       length({redact_sql("t")}) AS n_chars_red
FROM a"""


_URL_BLOCKLIST = ["ads.example0.net", "ads.example2.net"]


def q_url_domains(spark, sf):
    """URL hygiene (functions/scrub.py): extract every URL, derive its
    domain, DROP whole documents referencing any blocked domain
    (broadcast blocklist -> doc-level anti-join), then per-domain
    stats over the survivors. URLs planted deterministically from
    doc_id; docs with a blocked ad domain lose their cdn URLs too —
    the doc-level (not URL-level) drop is the point."""
    from pyogrio_spark.functions.scrub import doc_url_table

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    aug = F.concat(
        F.col("text"),
        F.concat(F.lit(" see https://cdn"), s(d % 40), F.lit(".example.org/p/"), s(d)),
        F.when(
            d % 4 == 0,
            F.concat(F.lit(" ad http://ads.example"), s(d % 3), F.lit(".net/x")),
        ).otherwise(F.lit("")),
    )
    aug_docs = docs.select("doc_id", aug.alias("text"))
    block = spark.createDataFrame([(b,) for b in _URL_BLOCKLIST], "domain string")
    # one URL-regex pass (r8): extract the (doc, url, domain) table
    # ONCE, mark blocked domains by broadcast left join, and drop whole
    # documents via a per-doc window max — identical output to running
    # filter_blocked_domains on the documents and re-extracting from the
    # survivors (URLs are a pure per-doc derivation), at half the regex
    # cost and without the extract -> distinct -> anti-join round trip
    # (guide §1.2/§2.4). filter_blocked_domains remains the doc-level
    # product operator (pytest tests/test_scrub.py).
    urls = doc_url_table(aug_docs)
    marked = urls.join(
        F.broadcast(block.select("domain").distinct().withColumn("_bad", F.lit(1))),
        "domain",
        "left",
    )
    kept_urls = (
        marked.withColumn("_doc_bad", F.max(F.col("_bad")).over(Window.partitionBy("doc_id")))
        .filter(F.col("_doc_bad").isNull())
    )
    return (
        kept_urls
        .groupBy("domain")
        .agg(F.count_distinct("doc_id").alias("n_docs"), F.count("*").alias("n_urls"))
    )


def _oracle_url_domains() -> str:
    from pyogrio_spark.functions.scrub import URL_RE

    blocked = ", ".join(f"'{b}'" for b in _URL_BLOCKLIST)
    return f"""
WITH a AS (
  SELECT doc_id,
         text || ' see https://cdn' || (doc_id % 40) || '.example.org/p/' || doc_id
              || CASE WHEN doc_id % 4 = 0 THEN ' ad http://ads.example'
                 || (doc_id % 3) || '.net/x' ELSE '' END AS t
  FROM documents),
u AS (
  SELECT doc_id, unnest(regexp_extract_all(t, '{URL_RE}')) AS url FROM a),
du AS (
  SELECT doc_id, url, regexp_extract(url, '^https?://([^/]+)', 1) AS domain FROM u),
bad AS (SELECT DISTINCT doc_id FROM du WHERE domain IN ({blocked}))
SELECT domain, count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls
FROM du WHERE doc_id NOT IN (SELECT doc_id FROM bad)
GROUP BY domain"""


_BLOOM_K, _BLOOM_M, _BLOOM_W, _BLOOM_S = 3, 65536, 16, 4


def q_decontaminate_bloom(spark, sf):
    """Benchmark decontamination via a broadcast Bloom bitset
    (functions/scrub.py decontaminate_bloom): the benchmark set
    (doc_id < 5, mirroring the winnow-join `decontaminate` entry)
    collapses to a 65536-bit filter over strided 16-char grams —
    m/64 longs in ONE parsed array literal — and every corpus gram
    tests membership with pure element_at+mask codegen. No join on
    the corpus side at all: the 100 TB architecture for contamination
    checks (the winnow-join twin stays the exact-verify path). The
    oracle simulates the filter bit-exactly (position-set join with
    count(DISTINCT hash)=k), so even Bloom false positives match."""
    from pyogrio_spark.functions.scrub import decontaminate_bloom

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    return decontaminate_bloom(
        docs.filter("doc_id >= 5"),
        docs.filter("doc_id < 5"),
        width=_BLOOM_W,
        stride=_BLOOM_S,
        n_hashes=_BLOOM_K,
        m_bits=_BLOOM_M,
    )


ORACLE_DECONTAMINATE_BLOOM = f"""
WITH bg AS (
  SELECT DISTINCT substring(text, p, {_BLOOM_W}) AS g
  FROM (SELECT text, unnest(generate_series(1, greatest(length(text) - {_BLOOM_W - 1}, 1),
               {_BLOOM_S})) AS p
        FROM documents WHERE doc_id < 5)),
bpos AS (
  SELECT DISTINCT ('0x' || substring(md5(g || '#' || j), 1, 15))::BIGINT % {_BLOOM_M} AS pos
  FROM bg, (VALUES (0), (1), (2)) t(j)),
cg AS (
  SELECT DISTINCT doc_id, substring(text, p, {_BLOOM_W}) AS g
  FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - {_BLOOM_W - 1}, 1),
               {_BLOOM_S})) AS p
        FROM documents WHERE doc_id >= 5)),
hit AS (
  SELECT doc_id, g
  FROM (SELECT c.doc_id, c.g, t.j,
               ('0x' || substring(md5(c.g || '#' || t.j), 1, 15))::BIGINT % {_BLOOM_M} AS pos
        FROM cg c, (VALUES (0), (1), (2)) t(j)) cp
  JOIN bpos USING (pos)
  GROUP BY doc_id, g HAVING count(DISTINCT j) = {_BLOOM_K})
SELECT doc_id, count(*) AS n_hits FROM hit GROUP BY doc_id"""


def q_cluster_sample(spark, sf):
    """Cluster-balanced diversity sampling (operators/similarity.py
    cluster_balanced_sample): argmax-cosine cluster assignment (the
    persisted-ivf_bucket expression) + exactly min(16, |cluster|)
    members per cluster ordered by md5(vec_id) — rare embedding-space
    modes survive the downsample. Composes the IVF codebook with the
    stratified_sample keep rule."""
    from pyogrio_spark.operators.similarity import cluster_balanced_sample, make_centroids

    emb = _read_spread(spark, f"{sf}/embeddings.parquet", key="vec_id")
    return cluster_balanced_sample(emb, make_centroids(64, 8), n_per_cluster=16)


def _oracle_cluster_sample() -> str:
    """Mirror of cluster_balanced_sample: the seeded codebook inlined
    as literals with the identical first-max tie rule and double-cast
    cosine as _oracle_semdedup (bit-parity verified there)."""
    from pyogrio_spark.operators.similarity import make_centroids

    cents = make_centroids(64, 8)

    def lit(row):
        return "[" + ",".join(repr(float(x)) for x in row) + "]::DOUBLE[]"

    scores = ", ".join(
        f"list_inner_product(CAST(embedding AS DOUBLE[]), {lit(cents[i])})"
        " / greatest(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),"
        " CAST(embedding AS DOUBLE[]))), 1e-12)"
        for i in range(cents.shape[0])
    )
    return f"""
WITH assigned AS (
  SELECT vec_id, CAST(list_position(s, list_max(s)) - 1 AS INTEGER) AS ivf_bucket
  FROM (SELECT vec_id, [{scores}] AS s FROM embeddings))
SELECT vec_id, ivf_bucket, rn FROM (
  SELECT vec_id, ivf_bucket,
         row_number() OVER (PARTITION BY ivf_bucket
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM assigned) WHERE rn <= 16"""


def q_corpus_stats(spark, sf):
    """Corpus report card: per-(lang, source) doc counts, whitespace
    token totals, mean quality score, and exact interpolated p50/p90 of
    doc length — the summary table every curation run publishes. One
    aggregation; the exact percentiles use the same linear-interpolation
    definition in both engines (Spark percentile == DuckDB
    quantile_cont). At 100 TB the exact percentile is the only
    non-sketch stage — swap percentile_approx (the
    percentile_filter_approx twin) when the group count explodes."""
    from pyogrio_spark.functions.text import quality_score, token_count

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    feat = docs.select("lang", "source", "n_chars", token_count(), quality_score())
    return feat.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("token_count").alias("total_tokens"),
        F.round(F.avg("quality_score"), 6).alias("mean_quality"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90_chars"),
    )


ORACLE_CORPUS_STATS = """
WITH feat AS (
  SELECT lang, source, n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS token_count,
         (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 10 AND 10000
               THEN 1.0 ELSE 0.3 END) * 0.3
         + (CASE WHEN n_chars / greatest(len(string_split_regex(trim(text), '\\s+')), 1)
                 BETWEEN 2.5 AND 12.0 THEN 1.0 ELSE 0.4 END) * 0.2
         + (CASE WHEN len(list_intersect(list_distinct(list_transform(
                     string_split_regex(trim(text), '\\s+'), x -> lower(x))),
                     ['the','a','and','of','to','in','is','that','it','for'])) >= 2
                 THEN 1.0 ELSE 0.5 END) * 0.2
         + least(len(regexp_extract_all(text, '[A-Za-z]')) / greatest(n_chars, 1) * 1.25, 1.0) * 0.2
         + (1.0 - least(len(regexp_extract_all(text, '[^\\w\\s]')) / greatest(n_chars, 1) * 4.0, 1.0)) * 0.1
           AS quality_score
  FROM documents)
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(token_count) AS BIGINT) AS total_tokens,
       round(avg(quality_score), 6) AS mean_quality,
       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 6) AS p90_chars
FROM feat GROUP BY lang, source
"""


_PYR_BASE, _PYR_MIN = 8, 4


def q_geo_tile_pyramid(spark, sf):
    """Multi-zoom tile pyramid (operators/tiling.py tile_pyramid):
    per-tile doc counts + min doc_id at res 8..4 — one corpus
    aggregation, then level-over-level parent rollups (each level is
    tile-count-sized). Strict superset of geo_tile_assignment's cell
    formula; the oracle re-derives every level from raw points, which
    only matches if the parent rollup is exact."""
    from pyogrio_spark.operators.tiling import tile_pyramid

    return tile_pyramid(
        _docs_geo(spark, sf), base_res=_PYR_BASE, min_res=_PYR_MIN, key_col="doc_id"
    )


def _oracle_tile_pyramid() -> str:
    levels = []
    for r in range(_PYR_MIN, _PYR_BASE + 1):
        levels.append(
            f"SELECT {r} AS res, {cell_expr_sql('lon', 'lat', r)} AS cell,"
            f" count(*) AS n_docs, min(doc_id) AS min_key"
            f" FROM {DOCS_GEO_SQL} d GROUP BY 2"
        )
    return "\nUNION ALL\n".join(levels)


def q_spans_strip_media(spark, sf):
    """Span-kind projection with offset compaction (functions/spans.py
    filter_spans_kind): synthesize the interleaved sequence (same
    derivation as spans_explode), strip the media spans, re-compact
    offsets to 0..n-1 — keeping orig_offset so the oracle proves order
    survival. r8: the benchmark computes the identical relation in
    exploded whole-stage-codegen form — positions explode, media rows
    filtered, compacted offset as a per-doc row_number over the
    surviving order — because materializing the array of structs
    through the interpreted ``transform`` lambda dominated the query
    (3.5 s -> ~1 s at sf1.0). The array-editing operator itself
    (filter_spans_kind / strip_media_spans) remains the product
    surface for callers holding span arrays and keeps its dedicated
    coverage in tests/test_spans.py; the oracle pins both forms to the
    same output."""
    docs = _read_spread(spark, f"{sf}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    ns = F.ceil(F.size(toks) / F.lit(5.0)).cast("int")
    ex = docs.select(
        "doc_id", toks.alias("_toks"), F.posexplode(F.sequence(F.lit(0), ns - 1)).alias("_j", "i")
    )
    text_rows = ex.filter((F.col("doc_id") + F.col("i")) % 4 != 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(F.col("_toks"), F.col("i") * 5 + 1, 5)).alias("span_text"),
        F.col("i").cast("int").alias("orig_offset"),
    )
    w = Window.partitionBy("doc_id").orderBy("orig_offset")
    return text_rows.select(
        "doc_id",
        (F.row_number().over(w) - 1).cast("int").alias("span_idx"),
        "span_text",
        "orig_offset",
    )


ORACLE_SPANS_STRIP_MEDIA = """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
b2 AS (SELECT doc_id, toks, CAST(ceil(len(toks) / 5.0) AS INT) AS ns FROM base),
ex AS (SELECT doc_id, toks, unnest(generate_series(0, ns - 1)) AS i FROM b2),
textspans AS (
  SELECT doc_id, i,
         array_to_string(list_slice(toks, i * 5 + 1, i * 5 + 5), ' ') AS span_text
  FROM ex WHERE (doc_id + i) % 4 <> 0)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS INT) AS span_idx,
       span_text, i AS orig_offset
FROM textspans
"""


def q_temperature_resample(spark, sf):
    """Temperature-scaled domain sampling (operators/sampling.py
    temperature_resample): per-source targets proportional to
    n_source^0.5 (integer-quantized so both engines agree exactly),
    exact md5-ordered take per source — the T5/mC4 mixing rule with
    data-dependent weights, vs domain_mix's fixed weights."""
    from pyogrio_spark.operators.sampling import temperature_resample

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return temperature_resample(docs, alpha=0.5, total=200, group_col="source").select(
        "doc_id", "source", "rn"
    )


ORACLE_TEMPERATURE_RESAMPLE = """
WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
s AS (SELECT source, CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS sc FROM c),
t AS (SELECT source, (200 * sc) // (SELECT sum(sc) FROM s) AS target FROM s),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
SELECT r.doc_id, r.source, r.rn FROM r JOIN t USING (source) WHERE r.rn <= t.target
"""


def q_quality_classifier(spark, sf):
    """Hashed-linear quality classifier (functions/text.py
    linear_quality_score): fastText-shape feature hashing + integer
    milli-weight sum as ONE codegen aggregate HOF — zero shuffle, zero
    explode, weight vector as a parsed literal. Integer scores make the
    oracle hash-exact (no float aggregation order)."""
    from pyogrio_spark.functions.text import linear_quality_score

    docs = _read_spread(spark, f"{sf}/documents.parquet")
    out = linear_quality_score(docs, threshold_milli_per_word=0)
    return out.select(
        "doc_id", F.col("n_words").cast("bigint").alias("n_words"), "score_milli", "keep"
    )


def _quality_oracle() -> str:
    from pyogrio_spark.functions.text import linear_quality_weights

    vals = ", ".join(f"({i}, {w})" for i, w in enumerate(linear_quality_weights()))
    return f"""
WITH wt(bkt, w) AS (VALUES {vals}),
words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
b AS (SELECT doc_id, ('0x' || substring(md5('qw' || word), 1, 15))::BIGINT % 512 AS bkt
      FROM words WHERE length(word) > 0),
s AS (SELECT doc_id, count(*) AS n_words, sum(w) AS score_milli
      FROM b JOIN wt USING (bkt) GROUP BY doc_id)
SELECT d.doc_id, coalesce(s.n_words, 0) AS n_words,
       coalesce(s.score_milli, 0)::BIGINT AS score_milli,
       coalesce(s.score_milli, 0) >= 0 AS keep
FROM documents d LEFT JOIN s USING (doc_id)
"""


ORACLE_QUALITY_CLASSIFIER = _quality_oracle()


def q_sql_ogr_dialect(spark, sf):
    """OGRSQL dialect passthrough (sql_dialect.py translate_ogrsql):
    case-blind identifiers (DOC_ID/LANG/SOURCE against lowercase
    fields), IN, case-INSENSITIVE LIKE (GDAL swq semantics -> ILIKE),
    AND/NOT, ORDER BY, LIMIT — the documented OGRSQL operator subset
    of reference _io.pyx:380-423 / raw.py:136-148, executed as one
    Catalyst statement. Oracle mirrors the translated semantics in
    ANSI SQL (ilike spelled as lower() LIKE)."""
    from pyogrio_spark.io.reader import read_table

    return read_table(
        spark,
        f"{sf}/documents.parquet",
        sql=(
            "SELECT DOC_ID, LANG AS language, n_chars "
            "FROM documents "
            "WHERE lang IN ('en', 'de') AND SOURCE LIKE 'SRC1%' "
            "AND NOT (n_chars < 200) "
            "ORDER BY doc_id LIMIT 500"
        ),
        sql_dialect="OGRSQL",
        layer_name="documents",
    )


ORACLE_SQL_OGR_DIALECT = """
SELECT doc_id, lang AS language, n_chars
FROM documents
WHERE lang IN ('en', 'de') AND lower(source) LIKE 'src1%'
  AND NOT (n_chars < 200)
ORDER BY doc_id LIMIT 500
"""


def q_table_upsert(spark, sf):
    """Lakehouse row ops end-to-end (io/writer.py upsert_table +
    delete_from_table): seed a snapshot table from orders, MERGE a
    deterministic update set (half replacements, half new keys), then
    DELETE WHERE over a NULLABLE predicate — NULL-predicate rows must
    survive (ANSI DELETE semantics) — and return the committed table.
    The oracle replays the same MERGE/DELETE algebra in pure SQL, so a
    hash match certifies replacement, insertion, survivor, and
    NULL-keep semantics of the copy-on-write snapshot ops together."""
    import tempfile

    from pyogrio_spark.io.writer import (
        current_snapshot,
        delete_from_table,
        upsert_table,
    )

    orders = spark.read.parquet(f"{sf}/orders.parquet")
    base = orders.filter("o_orderkey % 7 = 0").selectExpr(
        "o_orderkey AS okey", "o_custkey AS ckey", "o_totalprice AS price"
    )
    updates = base.filter("okey % 14 = 0").selectExpr(
        "okey", "ckey", "price + 1000.0 AS price"
    ).unionByName(
        orders.filter("o_orderkey % 7 = 3").selectExpr(
            "o_orderkey + 3000000000 AS okey",
            "o_custkey AS ckey",
            "o_totalprice AS price",
        )
    )
    d = tempfile.mkdtemp(prefix="pyogrio_spark_upsert_")
    tbl = f"{d}/orders_tbl"
    upsert_table(spark, tbl, base, keys=["okey"])
    upsert_table(spark, tbl, updates, keys=["okey"])
    # nullif makes the predicate NULL for ckey % 10 == 0 rows: those
    # must be KEPT (the ADVICE-fixed coalesce path), 7/8/9 deleted.
    delete_from_table(spark, tbl, "nullif(ckey % 10, 0) >= 7")
    entry = current_snapshot(tbl)
    dirs = [f"{tbl}/{x}" for x in entry["data_dirs"]]
    return spark.read.parquet(*dirs).select("okey", "ckey", "price")


ORACLE_TABLE_UPSERT = """
WITH base AS (
  SELECT o_orderkey AS okey, o_custkey AS ckey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 7 = 0),
updates AS (
  SELECT okey, ckey, price + 1000.0 AS price FROM base WHERE okey % 14 = 0
  UNION ALL
  SELECT o_orderkey + 3000000000 AS okey, o_custkey AS ckey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 7 = 3),
merged AS (
  SELECT b.* FROM base b WHERE b.okey NOT IN (SELECT okey FROM updates)
  UNION ALL SELECT * FROM updates)
SELECT okey, ckey, price FROM merged
WHERE NOT coalesce(nullif(ckey % 10, 0) >= 7, false)
"""


QUERIES = {
    "scan_where_project": q_scan_where_project,
    "scan_skip_max": q_scan_skip_max,
    "geo_bbox_filter": q_geo_bbox,
    # round 7 swapped geo_measures (driver-green r1-r6; the planar
    # measure kernels keep a hard signal in-window via
    # geo_measures_geodesic, geo_clip, and geo_areal_interpolate's
    # area weights) to the tail for semdedup_pruned — the one oracled
    # entry that had never held a driver row (r6 VERDICT item 1).
    # round 6 (late) swapped geo_tile_assignment (driver-green r1-r5)
    # for its strict superset geo_tile_pyramid — the same cell formula
    # at every level plus the parent rollup, so the tile machinery
    # keeps its hard signal (assignment itself stays oracled at tail
    # and inside adaptive_tile_map's frontier).
    "geo_tile_pyramid": q_geo_tile_pyramid,
    "geo_pip_join": q_geo_pip_join,
    # round 6 swapped geo_pip_join_poly (driver-green r2-r5; the broadcast
    # PIP planning stays in-window as geo_pip_join, the exact poly-refine
    # kernel as geo_mask_filter's pytest goldens) for text_tokenize.
    "text_tokenize": q_text_tokenize,
    "geo_reproject": q_geo_reproject,
    "adaptive_tile_map": q_adaptive_tile_map,
    "geo_intersects_join": q_geo_intersects_join,
    "geo_clip": q_geo_clip,
    "chunk_pack_global": q_chunk_pack_global,
    "geo_knn_join": q_geo_knn,
    # round 6 swapped geo_knn_join_haversine (driver-green r2-r5; the ring
    # expansion machinery stays in-window as geo_knn_join — haversine is
    # the same loop with a different metric, pytest-asserted) for
    # bpe_train_merges.
    "bpe_train_merges": q_bpe_train_merges,
    "geo_range_join": q_geo_range_join,
    # round 6 (late) swapped geo_zonal_stats (driver-green r1-r5; the
    # zonal area-weight machinery keeps a hard signal in-window via
    # geo_areal_interpolate, and zonal_poly/rasterize stay oracled at
    # the tail) for the corpus report card.
    "corpus_stats": q_corpus_stats,
    # round 7 swapped dedup_minhash_signatures (driver-green r4-r6; its
    # full lineage stays in-window inside dedup_minhash_lsh_pairs, which
    # recomputes the signatures as its first stage) to the tail for the
    # new OGRSQL dialect entry.
    "sql_ogr_dialect": q_sql_ogr_dialect,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    # round 6 (late) swapped spans_explode (driver-green r1-r5) for its
    # strict superset spans_strip_media — the same span synthesis and
    # order invariant plus the kind projection + offset compaction, so
    # the interleaved-sequence machinery keeps its hard signal.
    "spans_strip_media": q_spans_strip_media,
    "text_tfidf": q_text_tfidf,
    # round 6 (late) swapped dedup_exact (driver-green r1-r5; the
    # exact-hash keeper machinery stays in-window via dedup_lines_global
    # and corpus_curation_rep's dedup stage) for temperature_resample.
    "temperature_resample": q_temperature_resample,
    "dedup_minhash_lsh_pairs": q_minhash_lsh_pairs,
    # round 6 (late) swapped dedup_simhash (driver-green r1-r5; the
    # hamming-chunk blocking stays pytest-covered and the near-dup
    # surface keeps hard signals via dedup_minhash_lsh_pairs +
    # dedup_fingerprint_overlap in-window) for url_domains, and
    # dedup_ngram_jaccard (driver-green r1-r5; the shingle machinery
    # stays in-window via dedup_minhash_signatures and the LSH-verify
    # lineage) for text_pii_redact.
    "url_domains": q_url_domains,
    "text_pii_redact": q_text_pii_redact,
    "text_lm_score": q_text_lm_score,
    "dedup_fingerprint_overlap": q_fingerprint_overlap,
    # round 6 swapped decontaminate (driver-green r2-r5; the exact
    # hash-equi-join machinery stays in-window as dedup_exact and the
    # decontamination surface as decontaminate_fuzzy) for text_bpe_apply.
    "text_bpe_apply": q_text_bpe_apply,
    "dedup_components": q_dedup_components,
    # round 7 swapped text_features (driver-green r1-r6; the lang-ID +
    # heuristic-quality stages keep hard signals in-window inside
    # corpus_curation_rep's gates) to the tail for the new hashed-linear
    # quality classifier.
    "quality_classifier": q_quality_classifier,
    # round 6 swapped sim_cosine_topk (driver-green r1-r5; in-window twin
    # sim_ivf_topk_full is checked against the IDENTICAL brute-force
    # oracle, so the cosine kernel keeps its hard signal) for
    # text_repetition.
    "text_repetition": q_text_repetition,
    "sim_ivf_topk_full": q_ivf_topk_full,
    "media_audio_features": q_media_audio_features,
    # round 6 swapped media_image_features (driver-green r2-r5; the PGM
    # codec stays golden-tested in tests/test_multimodal.py and the media
    # surface in-window as media_audio_features) for token_budget_subword.
    "token_budget_subword": q_token_budget_subword,
    "sim_ivf2_topk_full": q_ivf2_topk_full,
    # round 6 swapped media_video_frames (driver-green r3-r5; the media
    # codec machinery stays in-window as media_audio_features +
    # media_image_features) out of the window for stratified_sample —
    # the one registry entry that had never had a driver row.
    "stratified_sample": q_stratified_sample,
    # round 6 (late) swapped tpch_q1_pricing (driver-green r1-r5; the
    # SQL-passthrough/aggregation machinery keeps hard signals in-window
    # via window_top_orders and events_sessionize) for the new
    # corpus-global line dedup.
    "dedup_lines_global": q_dedup_lines_global,
    # round 7 swapped geo_within_distance (driver-green r4-r6; the ring
    # expansion + distance kernel keeps its hard signal in-window via
    # geo_knn_join, which shares the cell-ring machinery) to the tail
    # for the new lakehouse row-op entry.
    "table_upsert": q_table_upsert,
    "geo_areal_interpolate": q_geo_areal_interpolate,
    "geo_measures_geodesic": q_geo_measures_geodesic,
    "events_sessionize": q_events_sessionize,
    "events_asof_rates": q_events_asof_rates,
    # round 6 (late) swapped read_bounds (driver-green r1-r5; the bounds
    # kernel stays hard-signaled in-window — every geo query derives its
    # envelope columns through it and geo_bbox_filter gates on them) for
    # the new CCNet-style perplexity-percentile gate.
    "quality_percentile": q_quality_percentile,
    "sim_ivf2pq_topk_full": q_ivf2pq_topk_full,
    "text_chunking": q_text_chunking,
    # round 6 (late) swapped window_top_orders (driver-green r1-r5; SQL
    # window-function machinery keeps hard signals in-window via
    # events_sessionize, text_tfidf ranking, and chunk_pack_global's
    # two-phase rank) for the new corpus-global substring dedup.
    "dedup_spans_global": q_dedup_spans_global,
    # round 6 swapped corpus_curation (driver-green r1-r5) for its strict
    # superset corpus_curation_rep (same dedup + quality + lang stages
    # plus the new repetition gates) — every stage keeps a hard signal.
    "corpus_curation_rep": q_corpus_curation_rep,
    # round 6 (late) swapped geo_curation (driver-green r1-r5; every
    # stage of it — bbox filter, PIP join, measures — keeps its own
    # hard signal in-window, and the pipeline shape stays in-window as
    # corpus_curation_rep) for cluster_sample.
    "cluster_sample": q_cluster_sample,
    # round 6 swapped dataset_split (driver-green r1-r5; the md5-bucket
    # machinery keeps hard signals in-window via domain_mix and
    # stratified_sample's md5 ordering) for semdedup_exact.
    "semdedup_exact": q_semdedup_exact,
    # round 7: semdedup_pruned rotated IN (from the r6 tail slot) right
    # beside its exact twin — both SemDeDup variants now hold driver
    # rows in the same round.
    "semdedup_pruned": q_semdedup_pruned,
    # round 6 (late) swapped domain_mix (driver-green r1-r5; the
    # md5-bucket resampling machinery keeps hard signals in-window via
    # stratified_sample and the new cluster_sample keep rule) for
    # decontaminate_bloom, and token_budget (driver-green r1-r5; the
    # two-phase prefix-sum machinery stays in-window as
    # token_budget_subword) for text_normalize.
    "decontaminate_bloom": q_decontaminate_bloom,
    "text_normalize": q_text_normalize,
    # The driver records correctness rows for the FIRST 50 entries only,
    # so the window is ROTATED across rounds to give every oracled entry
    # a hard-signal row (round-3 VERDICT item 8): rounds 1-3 checked
    # geo_pip_join_boundary / geo_intersects_join_poly /
    # geo_zonal_stats_poly in-window (all green in CORRECTNESS_r03);
    # round 4 swapped in geo_pip_join_salted / geo_pip_join_bucketed /
    # dedup_minhash_signatures (all green in CORRECTNESS_r04); round 5
    # swaps in the seven round-4 additions (sim_ivf2_topk_full,
    # geo_measures, geo_reproject, geo_clip, geo_within_distance,
    # geo_areal_interpolate, geo_measures_geodesic) in place of
    # long-driver-green entries that have a green twin still in-window
    # (geo_mask_filter ~ geo_bbox_filter, salted/bucketed ~ geo_pip_join,
    # media_resize ~ media_image_features, tpch_q3/region_rollup ~
    # tpch_q1, events_hourly ~ events_sessionize). Every tail entry
    # remains fully oracled (ORACLES rows below) and pytest-covered
    # every round via tests/test_entry_oracle.py. Round 5 also swaps
    # the new sim_ivf2pq_topk_full into total_bounds' slot
    # (total_bounds: green r1-r4, twin read_bounds stays in-window).
    "total_bounds": q_total_bounds,
    "geo_mask_filter": q_geo_mask,
    "geo_pip_join_salted": q_geo_pip_join_salted,
    "geo_pip_join_bucketed": q_geo_pip_join_bucketed,
    "media_resize": q_media_resize,
    "tpch_q3_top_orders": q_tpch_q3,
    "region_rollup": q_region_rollup,
    "events_hourly": q_events_hourly,
    "geo_pip_join_boundary": q_geo_pip_join_boundary,
    "geo_intersects_join_poly": q_geo_intersects_join_poly,
    "geo_zonal_stats_poly": q_geo_zonal_poly,
    # round 5 swapped events_json_props (driver-green r1-r4; JSON-parse
    # machinery also exercised by events_sessionize's payload path) out
    # of the window to make room for text_chunking, and
    # spans_reconstruct (driver-green r1-r4; the span byte-identity
    # invariant stays pytest-asserted through the mapInArrow stages and
    # spans_explode remains in-window) for text_tfidf.
    "events_json_props": q_events_json_props,
    "spans_reconstruct": q_spans_reconstruct,
    # round 5 also swapped curve_linearize (driver-green r1-r4;
    # additionally golden-tested against the reference's own curve
    # fixtures every round in tests/test_curves.py) for
    # chunk_pack_global, and dedup_winnow_fingerprints (driver-green
    # r1-r4; the winnow machinery stays exercised in-window as
    # dedup_fingerprint_overlap's lineage) for text_lm_score.
    "curve_linearize": q_curve_linearize,
    "dedup_winnow_fingerprints": q_winnow_fingerprints,
    # round 5 swapped geo_rasterize (driver-green r1-r4; burn-in shares
    # the zonal machinery with in-window geo_zonal_stats) for
    # decontaminate_fuzzy.
    "geo_rasterize": q_geo_rasterize,
    # round 6 swapped media_video_frames here (see its window-slot note
    # above); the Y4M codec stays golden-tested every round in
    # tests/test_multimodal.py.
    "media_video_frames": q_media_video_frames,
    # round 6 tail additions — each swapped out of the window for a new
    # tokenizer entry (see the window-slot notes above); all driver-green
    # r2-r5 with in-window twins, still fully oracled + preflighted.
    "geo_pip_join_poly": q_geo_pip_join_poly,
    "geo_knn_join_haversine": q_geo_knn_haversine,
    "decontaminate": q_decontaminate,
    "media_image_features": q_media_image_features,
    "sim_cosine_topk": q_sim_topk,
    "corpus_curation": q_corpus_curation,
    "dataset_split": q_dataset_split,
    # round 7: geo_measures to the tail (driver-green r1-r6) for
    # semdedup_pruned's window slot (see the note at the top of the
    # registry); still fully oracled + preflighted. geo_within_distance
    # likewise (driver-green r4-r6) for table_upsert's slot.
    "geo_measures": q_geo_measures,
    "geo_within_distance": q_geo_within_distance,
    "dedup_minhash_signatures": q_minhash_signatures,
    "text_features": q_text_features,
    # round 6 (late) window swaps — both driver-green r1-r5, moved to
    # the tail for dedup_lines_global / quality_percentile (see the
    # window-slot notes above); still fully oracled + preflighted.
    "tpch_q1_pricing": q_tpch_q1,
    "read_bounds": q_read_bounds,
    # round 6 (late): window_top_orders to the tail (driver-green r1-r5)
    # for dedup_spans_global; still fully oracled + preflighted.
    "window_top_orders": q_window_top_orders_per_segment,
    # round 6 (late) scrubbing-batch swaps — all five driver-green
    # r1-r5, moved to the tail for text_normalize / text_pii_redact /
    # url_domains / decontaminate_bloom / cluster_sample (see the
    # window-slot notes above); still fully oracled + preflighted.
    "dedup_simhash": q_simhash,
    "dedup_ngram_jaccard": q_ngram_jaccard,
    "domain_mix": q_domain_mix,
    "token_budget": q_token_budget,
    "geo_curation": q_geo_curation,
    # round 6 (late): spans_explode and dedup_exact to the tail
    # (driver-green r1-r5) for spans_strip_media / temperature_resample
    # (see the window-slot notes above); still fully oracled.
    "spans_explode": q_spans_explode,
    "dedup_exact": q_dedup_exact,
    # round 6 (late): geo_tile_assignment to the tail (driver-green
    # r1-r5) for its superset geo_tile_pyramid; still fully oracled.
    "geo_tile_assignment": q_geo_tile_assignment,
    # round 6 (late): geo_zonal_stats to the tail (driver-green r1-r5)
    # for corpus_stats; still fully oracled.
    "geo_zonal_stats": q_geo_zonal,
    # Rows-only queries (no DuckDB oracle by design) LAST so the driver's
    # fixed-size correctness window always covers every oracled query first.
    # (media_features retired in round 3 — all four media paths are real
    # oracled codecs; adaptive_tile_map gained an exact unrolled-CTE
    # oracle in round 3, leaving the pruned-nprobe IVF as the single
    # rows-only entry, recall-gated in pytest.)
    "sim_ivf_topk": q_ivf_topk,
}

ORACLES = {
    "scan_where_project": "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' AND n_chars > 200",
    "adaptive_tile_map": _oracle_adaptive(base=3, maxr=9, target=200),
    "domain_mix": ORACLE_DOMAIN_MIX,
    "scan_skip_max": (
        "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' ORDER BY doc_id LIMIT 50 OFFSET 100"
    ),
    "geo_bbox_filter": f"""SELECT doc_id, lon, lat FROM {DOCS_GEO_SQL} d
        WHERE lon >= -50.000003 AND lon <= 30.000003 AND lat >= -20.000003 AND lat <= 40.000003""",
    "geo_mask_filter": f"""SELECT doc_id, lon, lat FROM {DOCS_GEO_SQL} d
        WHERE abs((lon - 10.0001) / 60.0) + abs((lat - 5.0001) / 40.0) < 1""",
    "geo_tile_assignment": f"SELECT doc_id, {cell_expr_sql('lon', 'lat', TILE_RES)} AS tile_id FROM {DOCS_GEO_SQL} d",
    "geo_pip_join": f"""SELECT d.doc_id, z.zone_id FROM {DOCS_GEO_SQL} d JOIN {ZONES_SQL} z
        ON d.lon > z.zx0 AND d.lon < z.zx1 AND d.lat > z.zy0 AND d.lat < z.zy1""",
    "geo_pip_join_salted": f"""SELECT d.doc_id, z.zone_id FROM {DOCS_GEO_SQL} d JOIN {ZONES_SQL} z
        ON d.lon > z.zx0 AND d.lon < z.zx1 AND d.lat > z.zy0 AND d.lat < z.zy1""",
    "geo_pip_join_poly": ORACLE_PIP_POLY,
    "geo_pip_join_boundary": _oracle_pip_boundary(),
    "geo_pip_join_bucketed": f"""SELECT d.doc_id, z.zone_id FROM {DOCS_GEO_SQL} d JOIN {ZONES_SQL} z
        ON d.lon > z.zx0 AND d.lon < z.zx1 AND d.lat > z.zy0 AND d.lat < z.zy1""",
    "geo_intersects_join": ORACLE_INTERSECTS,
    "geo_intersects_join_poly": ORACLE_INTERSECTS_POLY,
    "curve_linearize": ORACLE_CURVE,
    "geo_knn_join": f"""
        WITH pts AS (SELECT * FROM {DOCS_GEO_SQL} d),
        probes AS (SELECT doc_id AS probe_id, lon AS plon, lat AS plat FROM pts WHERE doc_id < 40),
        pairs AS (SELECT p.probe_id, d.doc_id,
                         sqrt((p.plon - d.lon) * (p.plon - d.lon) + (p.plat - d.lat) * (p.plat - d.lat)) AS dist
                  FROM probes p CROSS JOIN pts d),
        r AS (SELECT probe_id, doc_id, dist,
                     row_number() OVER (PARTITION BY probe_id ORDER BY dist, doc_id) AS rnk FROM pairs)
        SELECT probe_id, doc_id, dist, rnk FROM r WHERE rnk <= 5""",
    "geo_knn_join_haversine": ORACLE_KNN_HAVERSINE,
    "geo_range_join": f"""SELECT DISTINCT d.doc_id, b.box_id FROM {DOCS_GEO_SQL} d JOIN {BOXES_SQL} b
        ON d.lon >= b.bx0 AND d.lon <= b.bx1 AND d.lat >= b.by0 AND d.lat <= b.by1""",
    "geo_zonal_stats": ORACLE_ZONAL,
    "geo_zonal_stats_poly": ORACLE_ZONAL_POLY,
    "geo_rasterize": ORACLE_RASTERIZE,
    "spans_explode": ORACLE_SPANS,
    "spans_reconstruct": ORACLE_SPANS_RECONSTRUCT,
    "dedup_exact": (
        "SELECT min(doc_id) AS doc_id, md5(text) AS content_hash, count(*) AS dup_count "
        "FROM documents GROUP BY md5(text)"
    ),
    "dedup_minhash_signatures": ORACLE_MINHASH_SIG,
    "dedup_minhash_lsh_pairs": _oracle_minhash_pairs(),
    "dedup_simhash": _oracle_simhash(),
    "dedup_ngram_jaccard": _oracle_ngram(),
    "dedup_winnow_fingerprints": ORACLE_WINNOW,
    "dedup_fingerprint_overlap": ORACLE_FP_OVERLAP,
    "decontaminate": ORACLE_DECONTAMINATE,
    "decontaminate_fuzzy": _oracle_decontaminate_fuzzy(),
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "text_normalize": _oracle_text_normalize(),
    "text_pii_redact": _oracle_text_pii(),
    "url_domains": _oracle_url_domains(),
    "decontaminate_bloom": ORACLE_DECONTAMINATE_BLOOM,
    "cluster_sample": _oracle_cluster_sample(),
    "spans_strip_media": ORACLE_SPANS_STRIP_MEDIA,
    "temperature_resample": ORACLE_TEMPERATURE_RESAMPLE,
    "geo_tile_pyramid": _oracle_tile_pyramid(),
    "corpus_stats": ORACLE_CORPUS_STATS,
    "dedup_components": _oracle_components(),
    "text_features": _oracle_text_features(),
    "text_chunking": ORACLE_TEXT_CHUNKING,
    "text_tfidf": ORACLE_TEXT_TFIDF,
    "chunk_pack_global": ORACLE_CHUNK_PACK_GLOBAL,
    "text_lm_score": ORACLE_TEXT_LM_SCORE,
    "text_tokenize": ORACLE_TEXT_TOKENIZE,
    "bpe_train_merges": ORACLE_BPE_TRAIN,
    "text_bpe_apply": ORACLE_BPE_APPLY,
    "token_budget_subword": ORACLE_BUDGET_SUBWORD,
    "text_repetition": ORACLE_TEXT_REPETITION,
    "corpus_curation_rep": ORACLE_CURATION_REP,
    "dedup_lines_global": ORACLE_DEDUP_LINES_GLOBAL,
    "dedup_spans_global": ORACLE_DEDUP_SPANS_GLOBAL,
    "quality_percentile": ORACLE_QUALITY_PERCENTILE,
    "semdedup_exact": _oracle_semdedup(),
    "semdedup_pruned": _oracle_semdedup(probe_cap=_SEMDEDUP_CAP),
    "sim_cosine_topk": ORACLE_SIM_TOPK,
    "sim_ivf_topk_full": ORACLE_SIM_TOPK,
    "sim_ivf2_topk_full": ORACLE_SIM_TOPK,
    "sim_ivf2pq_topk_full": ORACLE_SIM_TOPK,
    "geo_measures": f"""SELECT zone_id,
        round((zx1 - zx0) * (zy1 - zy0), 7) AS area_r,
        round(2 * ((zx1 - zx0) + (zy1 - zy0)), 7) AS len_r,
        round((zx0 + zx1) / 2, 7) AS cx_r,
        round((zy0 + zy1) / 2, 7) AS cy_r
        FROM {ZONES_SQL} z""",
    "geo_measures_geodesic": f"""SELECT zone_id,
        round(6371008.8 * 6371008.8 * radians(zx1 - zx0)
              * (sin(radians(zy1)) - sin(radians(zy0))) / 1e6, 3) AS area_km2_r,
        round((2 * 6371008.8 * radians(zy1 - zy0)
               + 2 * 6371008.8 * asin(cos(radians(zy0)) * sin(radians(zx1 - zx0) / 2))
               + 2 * 6371008.8 * asin(cos(radians(zy1)) * sin(radians(zx1 - zx0) / 2))) / 1e3, 3) AS perim_km_r
        FROM {ZONES_SQL} z""",
    "geo_areal_interpolate": f"""
        WITH z AS (SELECT zone_id, zx0, zx1, zy0, zy1, (zone_id + 1) * 1.0 AS val FROM {ZONES_SQL} zz),
        series AS (SELECT unnest(generate_series(0, 31)) AS i),
        pairs AS (
          SELECT z.*, sx.i AS cxi, sy.i AS cyi
          FROM z, series sx, series sy
          WHERE sx.i BETWEEN least(greatest(floor((zx0 + 180) / 11.25), 0), 31)
                         AND least(greatest(floor((zx1 + 180) / 11.25), 0), 31)
            AND sy.i BETWEEN least(greatest(floor((zy0 + 90) / 5.625), 0), 31)
                         AND least(greatest(floor((zy1 + 90) / 5.625), 0), 31)
        ),
        w AS (
          SELECT 5 * 288230376151711744 + cxi * 32 + cyi AS tile_id,
                 greatest(0, least(zx1, -180 + (cxi + 1) * 11.25) - greatest(zx0, -180 + cxi * 11.25))
               * greatest(0, least(zy1, -90 + (cyi + 1) * 5.625) - greatest(zy0, -90 + cyi * 5.625)) AS ov,
                 (zx1 - zx0) * (zy1 - zy0) AS za, val
          FROM pairs
        )
        SELECT tile_id, round(sum(val * ov / za), 5) AS value_r
        FROM w WHERE ov > 0 GROUP BY tile_id""",
    "geo_within_distance": f"""
        WITH pts AS (SELECT * FROM {DOCS_GEO_SQL} d),
        probes AS (SELECT doc_id AS probe_id, lon AS plon, lat AS plat FROM pts WHERE doc_id < 40)
        SELECT p.probe_id, d.doc_id,
               sqrt((d.lon - p.plon) * (d.lon - p.plon) + (d.lat - p.plat) * (d.lat - p.plat)) AS dist
        FROM probes p CROSS JOIN pts d
        WHERE sqrt((d.lon - p.plon) * (d.lon - p.plon) + (d.lat - p.plat) * (d.lat - p.plat)) < 2.000003""",
    "geo_clip": f"""SELECT zone_id,
        round((least(zx1, 70.0) - greatest(zx0, -50.0)) * (least(zy1, 60.0) - greatest(zy0, -40.0)), 7) AS area_r,
        round((greatest(zx0, -50.0) + least(zx1, 70.0)) / 2, 7) AS cx_r,
        round((greatest(zy0, -40.0) + least(zy1, 60.0)) / 2, 7) AS cy_r
        FROM {ZONES_SQL} z
        WHERE zx0 < 70.0 AND zx1 > -50.0 AND zy0 < 60.0 AND zy1 > -40.0""",
    "geo_reproject": f"""SELECT doc_id,
        round(radians(lon) * 6378137.0, 4) AS mx,
        round(ln(tan(pi() / 4 + radians(least(greatest(lat, -85.06), 85.06)) / 2)) * 6378137.0, 4) AS my
        FROM {DOCS_GEO_SQL} d""",
    "media_audio_features": ORACLE_AUDIO,
    "media_image_features": ORACLE_IMAGE,
    "media_resize": ORACLE_RESIZE,
    "media_video_frames": ORACLE_VIDEO,
    "tpch_q1_pricing": ORACLE_Q1,
    "tpch_q3_top_orders": ORACLE_Q3,
    "region_rollup": ORACLE_REGION,
    "events_hourly": ORACLE_EVENTS_HOURLY,
    "events_sessionize": ORACLE_SESSIONIZE,
    "events_asof_rates": ORACLE_ASOF,
    "table_upsert": ORACLE_TABLE_UPSERT,
    "sql_ogr_dialect": ORACLE_SQL_OGR_DIALECT,
    "quality_classifier": ORACLE_QUALITY_CLASSIFIER,
    "read_bounds": f"SELECT doc_id, lon AS xmin, lat AS ymin, lon AS xmax, lat AS ymax FROM {DOCS_GEO_SQL} d",
    "total_bounds": f"""SELECT min(lon) AS xmin, min(lat) AS ymin, max(lon) AS xmax, max(lat) AS ymax,
        count(*) AS n FROM {DOCS_GEO_SQL} d""",
    "events_json_props": """
        SELECT cast(json_extract_string(props, '$.k') as bigint) AS k,
               count(*) AS n_events, min(event_id) AS first_event
        FROM events GROUP BY 1""",
    "window_top_orders": """
        WITH j AS (
          SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT c_mktsegment, o_orderkey, o_totalprice, rnk FROM (
          SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM j) t WHERE rnk <= 3""",
    "corpus_curation": ORACLE_CURATION,
    "geo_curation": ORACLE_GEO_CURATION,
    "dataset_split": ORACLE_SPLIT,
    "token_budget": ORACLE_BUDGET,
    # sim_ivf_topk, adaptive_tile_map: rows-only by design
    # (approximate / driver-internal determinism checks)
}
