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

