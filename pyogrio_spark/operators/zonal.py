"""Raster ↔ vector zonal statistics (Raptor-style, PAPERS.md:6).

Raster side: a tile grid (tile_x, tile_y, value) with tile centers at
known coordinates. Vector side: zone polygons covered into grid cells
with full/partial flags. Tiles whose center lands in a full-cover cell
contribute with *no* geometry test; only boundary-cell tiles get the
exact center-in-polygon refine (the standard zonal rule: a pixel
belongs to the zone containing its center). Aggregation is the
built-in partial+final hash agg.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyogrio_spark.geometry.predicates import PreparedPolygon
from pyogrio_spark.index.grid import LAT0, LON0, SPAN_LAT, SPAN_LON, _RES_SHIFT

DEFAULT_RES = 7


def tiles_with_centers(tiles: DataFrame, tile_deg: float, res: int = DEFAULT_RES) -> DataFrame:
    """Attach center coords + cell_id to a (tile_x, tile_y, value) grid —
    all arithmetic, codegen-friendly."""
    n = 1 << res
    base = 1 << _RES_SHIFT
    cx = (F.col("tile_x").cast("double") + 0.5) * tile_deg
    cy = (F.col("tile_y").cast("double") + 0.5) * tile_deg
    gx = F.least(F.greatest(F.floor((cx - F.lit(LON0)) / F.lit(SPAN_LON) * n).cast("long"), F.lit(0)), F.lit(n - 1))
    gy = F.least(F.greatest(F.floor((cy - F.lit(LAT0)) / F.lit(SPAN_LAT) * n).cast("long"), F.lit(0)), F.lit(n - 1))
    return (
        tiles.withColumn("cx", cx)
        .withColumn("cy", cy)
        .withColumn("cell_id", F.lit(res).cast("long") * F.lit(base) + gx * n + gy)
    )


def zonal_stats(
    tiles: DataFrame,
    cover: DataFrame,
    zone_key: str = "fid",
    value_col: str = "value",
    aggs: tuple = ("count", "sum", "mean", "min", "max"),
) -> DataFrame:
    """-> one row per zone with the requested statistics over tiles whose
    center falls inside the zone polygon. ``tiles`` from
    ``tiles_with_centers``; ``cover`` from ``zones_cell_cover``."""
    zgeom = "_zone_geom"
    cover = cover.withColumnRenamed("geometry_wkb", zgeom)
    joined = tiles.join(F.broadcast(cover), on="cell_id", how="inner")
    full = joined.filter(F.col("full_cover")).select(zone_key, value_col)
    has_rect = "is_rect" in cover.columns
    if has_rect:
        # rectangle zones refine JVM-side (ray-cast-equivalent half-open box)
        rect_pass = joined.filter(
            ~F.col("full_cover")
            & F.col("is_rect")
            & (F.col("cx") >= F.col("zxmin"))
            & (F.col("cx") < F.col("zxmax"))
            & (F.col("cy") >= F.col("zymin"))
            & (F.col("cy") < F.col("zymax"))
        ).select(zone_key, value_col)
        full = full.unionByName(rect_pass)
        joined = joined.filter(~F.col("is_rect"))
    boundary = joined.filter(~F.col("full_cover")).select(zone_key, value_col, "cx", "cy", zgeom)

    ztype = cover.schema[zone_key].dataType.simpleString()
    vtype = tiles.schema[value_col].dataType.simpleString()

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prep_cache: dict[bytes, PreparedPolygon] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            cx = pdf["cx"].to_numpy(dtype=np.float64)
            cy = pdf["cy"].to_numpy(dtype=np.float64)
            for zwkb, idx in pdf.groupby(zgeom, sort=False).indices.items():
                prep = prep_cache.get(zwkb)
                if prep is None:
                    prep = prep_cache[zwkb] = PreparedPolygon(bytes(zwkb))
                keep[idx] = prep.contains_points(cx[idx], cy[idx])
            yield pdf.loc[keep, [zone_key, value_col]]

    refined = boundary.mapInPandas(refine, schema=f"`{zone_key}` {ztype}, `{value_col}` {vtype}")
    members = full.unionByName(refined)

    agg_map = {
        "count": F.count(value_col).alias("tile_count"),
        "sum": F.sum(value_col).alias("value_sum"),
        "mean": F.avg(value_col).alias("value_mean"),
        "min": F.min(value_col).alias("value_min"),
        "max": F.max(value_col).alias("value_max"),
    }
    return members.groupBy(zone_key).agg(*[agg_map[a] for a in aggs])


def rasterize_zones(
    tiles: DataFrame,
    cover: DataFrame,
    zone_key: str = "fid",
    tie: str = "min",
) -> DataFrame:
    """Vector -> raster: burn zone ids into the tile grid — each tile
    (pixel) gets the id of the zone containing its center, the inverse
    of ``zonal_stats`` (same standard center rule; tiles outside every
    zone are absent, i.e. nodata). Overlapping zones resolve by
    ``tie``: 'min'/'max' zone id — deterministic, engine-independent.

    Same plan shape as zonal_stats: full-cover cells and rect zones
    assign JVM-side; only boundary cells of irregular polygons touch
    the pandas refine. -> (tile_x, tile_y, zone_key).
    """
    zgeom = "_zone_geom"
    cover = cover.withColumnRenamed("geometry_wkb", zgeom)
    joined = tiles.join(F.broadcast(cover), on="cell_id", how="inner")

    full = joined.filter(F.col("full_cover")).select("tile_x", "tile_y", zone_key)
    if "is_rect" in cover.columns:
        rect_pass = joined.filter(
            ~F.col("full_cover")
            & F.col("is_rect")
            & (F.col("cx") >= F.col("zxmin"))
            & (F.col("cx") < F.col("zxmax"))
            & (F.col("cy") >= F.col("zymin"))
            & (F.col("cy") < F.col("zymax"))
        ).select("tile_x", "tile_y", zone_key)
        full = full.unionByName(rect_pass)
        joined = joined.filter(~F.col("is_rect"))
    boundary = joined.filter(~F.col("full_cover")).select("tile_x", "tile_y", zone_key, "cx", "cy", zgeom)

    ztype = cover.schema[zone_key].dataType.simpleString()

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prep_cache: dict[bytes, PreparedPolygon] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            cx = pdf["cx"].to_numpy(dtype=np.float64)
            cy = pdf["cy"].to_numpy(dtype=np.float64)
            for zwkb, idx in pdf.groupby(zgeom, sort=False).indices.items():
                prep = prep_cache.get(zwkb)
                if prep is None:
                    prep = prep_cache[zwkb] = PreparedPolygon(bytes(zwkb))
                keep[idx] = prep.contains_points(cx[idx], cy[idx])
            yield pdf.loc[keep, ["tile_x", "tile_y", zone_key]]

    refined = boundary.mapInPandas(refine, schema=f"tile_x int, tile_y int, `{zone_key}` {ztype}")
    members = full.unionByName(refined)
    agg = F.min(zone_key) if tie == "min" else F.max(zone_key)
    return members.groupBy("tile_x", "tile_y").agg(agg.alias(zone_key))



def areal_interpolate(
    zones: DataFrame,
    value_col: str,
    res: int,
    zone_key: str = "zone_id",
    geom_col: str = "geometry_wkb",
) -> DataFrame:
    """Area-weighted areal interpolation (the tobler/dasymetric
    building block): redistribute each zone's ``value_col`` onto the
    grid tiles at ``res`` proportionally to the INTERSECTION AREA of
    zone and tile -> (tile_id, value). Σ_tile value == Σ_zone value for
    zones fully inside the grid (weights per zone sum to 1).

    Plan shape: candidate (zone, tile) pairs enumerate in PURE CODEGEN
    (explode over the envelope's cell index ranges — no driver lists,
    scales to fact-sized zone tables), then one Arrow-batched kernel
    clips each zone to its tile rectangle (Sutherland-Hodgman,
    geometry/measure.py) and computes the area weight; a final
    groupBy(tile) sums partial values — one shuffle."""
    from pyogrio_spark.functions.geo import bounds_columns
    from pyogrio_spark.geometry import measure as M
    from pyogrio_spark.geometry import wkb as W

    n = 1 << res
    w_deg = SPAN_LON / n
    h_deg = SPAN_LAT / n
    base = 1 << _RES_SHIFT

    b = bounds_columns(zones.select(zone_key, geom_col, value_col), geom_col)

    def cell_of(col, origin, span):
        return F.least(
            F.greatest(F.floor((F.col(col) - F.lit(origin)) / F.lit(span) * n).cast("long"), F.lit(0)),
            F.lit(n - 1),
        )

    cand = (
        b.withColumn("_x0", cell_of("xmin", LON0, SPAN_LON))
        .withColumn("_x1", cell_of("xmax", LON0, SPAN_LON))
        .withColumn("_y0", cell_of("ymin", LAT0, SPAN_LAT))
        .withColumn("_y1", cell_of("ymax", LAT0, SPAN_LAT))
        .withColumn("cx_i", F.explode(F.sequence(F.col("_x0"), F.col("_x1"))))
        .withColumn("cy_i", F.explode(F.sequence(F.col("_y0"), F.col("_y1"))))
        .withColumn("tile_id", F.lit(res) * F.lit(base) + F.col("cx_i") * n + F.col("cy_i"))
        .select(zone_key, geom_col, value_col, "tile_id", "cx_i", "cy_i")
    )

    out_schema = "`tile_id` bigint, `part_val` double"

    def weigh(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        area_cache: dict[bytes, float] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            geoms_raw = list(pdf[geom_col])
            values = pdf[value_col].to_numpy()
            cxs = pdf["cx_i"].to_numpy()
            cys = pdf["cy_i"].to_numpy()
            tids = pdf["tile_id"].to_numpy()
            tiles, vals = [], []
            for i in range(len(pdf)):
                wkb = bytes(geoms_raw[i])
                g = W.parse_wkb(wkb)
                za = area_cache.get(wkb)
                if za is None:
                    za = area_cache[wkb] = M.area(g)
                if za <= 0.0:
                    continue
                tx0 = LON0 + float(cxs[i]) * w_deg
                ty0 = LAT0 + float(cys[i]) * h_deg
                clipped = M.clip_by_rect(g, tx0, ty0, tx0 + w_deg, ty0 + h_deg)
                if clipped is None:
                    continue
                ca = M.area(W.parse_wkb(clipped))
                if ca <= 0.0:
                    continue
                tiles.append(int(tids[i]))
                vals.append(float(values[i]) * ca / za)
            yield pd.DataFrame({"tile_id": tiles, "part_val": vals})

    parts = cand.mapInPandas(weigh, schema=out_schema)
    return parts.groupBy("tile_id").agg(F.sum("part_val").alias("value"))
