"""Geometry column functions for Spark DataFrames.

Split by cost model:
- cell assignment / envelope predicates are pure SQL expressions ->
  whole-stage codegen, zero Python;
- WKB decode (the reference's ``process_geometry``/``from_wkb`` boundary,
  /root/reference/pyogrio/_io.pyx:977-1025, geopandas.py:489-523) is an
  Arrow-batched pandas UDF — the vectorized slow path, never per-row.

pandas UDFs are created lazily (Spark parses the DDL return type against
an active session), cached on first use.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.index.grid import cell_expr_sql


def cell_id_column(lon_col: str, lat_col: str, res: int) -> Column:
    """Grid cell id as a JVM-side expression (no UDF)."""
    return F.expr(cell_expr_sql(lon_col, lat_col, res))


# --------------------------------------------------- measures / transforms

WEB_MERCATOR_R = 6378137.0


def mercator_x_expr(lon_col: str) -> Column:
    """EPSG:4326 lon -> EPSG:3857 x, pure codegen (no UDF)."""
    return F.radians(F.col(lon_col)) * F.lit(WEB_MERCATOR_R)


def mercator_y_expr(lat_col: str) -> Column:
    """EPSG:4326 lat -> EPSG:3857 y, pure codegen; latitude clamped to
    the Mercator validity band like PROJ."""
    lat = F.least(F.greatest(F.col(lat_col), F.lit(-85.06)), F.lit(85.06))
    return F.log(F.tan(F.lit(3.141592653589793 / 4.0) + F.radians(lat) / 2)) * F.lit(WEB_MERCATOR_R)


@lru_cache(maxsize=1)
def _measure_udf():
    @pandas_udf("area double, length double, cx double, cy double")
    def measure_udf(wkb: pd.Series) -> pd.DataFrame:
        from pyogrio_spark.geometry import measure as M

        rows = []
        for b in wkb:
            g = None if b is None else W.parse_wkb(bytes(b))
            cx, cy = M.centroid(g)
            rows.append((M.area(g), M.length(g), cx, cy))
        return pd.DataFrame(rows, columns=["area", "length", "cx", "cy"])

    return measure_udf


def measure_columns(df: DataFrame, geom_col: str = "geometry_wkb") -> DataFrame:
    """Attach planar ``area``/``length``/centroid (``cx``,``cy``)
    columns — the GeoSeries.area/.length/.centroid surface, batch
    kernels in geometry/measure.py."""
    m = _measure_udf()(F.col(geom_col))
    return (
        df.withColumn("_m", m)
        .withColumn("area", F.col("_m.area"))
        .withColumn("length", F.col("_m.length"))
        .withColumn("cx", F.col("_m.cx"))
        .withColumn("cy", F.col("_m.cy"))
        .drop("_m")
    )


@lru_cache(maxsize=1)
def _convex_hull_udf():
    @pandas_udf("binary")
    def hull_udf(wkb: pd.Series) -> pd.Series:
        from pyogrio_spark.geometry import measure as M

        return pd.Series(
            [None if b is None else M.convex_hull(W.parse_wkb(bytes(b))) for b in wkb]
        )

    return hull_udf


def convex_hull_column(geom_col: str = "geometry_wkb") -> Column:
    """GeoSeries.convex_hull (monotone chain, CCW shell)."""
    return _convex_hull_udf()(F.col(geom_col))


@lru_cache(maxsize=8)
def _simplify_udf(tol: float):
    @pandas_udf("binary")
    def simp_udf(wkb: pd.Series) -> pd.Series:
        from pyogrio_spark.geometry import measure as M

        return pd.Series(
            [None if b is None else M.simplify(W.parse_wkb(bytes(b)), tol) for b in wkb]
        )

    return simp_udf


def simplify_column(tol: float, geom_col: str = "geometry_wkb") -> Column:
    """GeoSeries.simplify(tol) — Douglas-Peucker
    (preserve_topology=False semantics, documented in measure.py)."""
    return _simplify_udf(float(tol))(F.col(geom_col))


@lru_cache(maxsize=1)
def _measure_geodesic_udf():
    @pandas_udf("area_m2 double, length_m double")
    def mg_udf(wkb: pd.Series) -> pd.DataFrame:
        from pyogrio_spark.geometry import measure as M

        rows = []
        for b in wkb:
            g = None if b is None else W.parse_wkb(bytes(b))
            rows.append((M.area_geodesic(g), M.length_geodesic(g)))
        return pd.DataFrame(rows, columns=["area_m2", "length_m"])

    return mg_udf


def measure_geodesic_columns(df: DataFrame, geom_col: str = "geometry_wkb") -> DataFrame:
    """Attach spherical ``area_m2`` / great-circle ``length_m`` for
    lon/lat geometries — the metric answers geopandas users otherwise
    reproject for (spherical-excess area, haversine edges)."""
    m = _measure_geodesic_udf()(F.col(geom_col))
    return (
        df.withColumn("_mg", m)
        .withColumn("area_m2", F.col("_mg.area_m2"))
        .withColumn("length_m", F.col("_mg.length_m"))
        .drop("_mg")
    )


@lru_cache(maxsize=1)
def _parts_udf():
    @pandas_udf("array<binary>")
    def parts_udf(wkb: pd.Series) -> pd.Series:
        from pyogrio_spark.geometry import wkb as _W

        out = []
        for b in wkb:
            if b is None:
                out.append(None)
                continue
            g = _W.parse_wkb(bytes(b))
            if g.type in ("MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"):
                out.append([_W.encode_geom(p) for p in g.coords])
            else:
                out.append([_W.encode_geom(g)])
        return pd.Series(out)

    return parts_udf


def explode_geometry(df: DataFrame, geom_col: str = "geometry_wkb") -> DataFrame:
    """GeoSeries.explode: one output row per single-part component of a
    multi geometry (singles pass through; null geometries keep one row
    with part_idx null). Adds ``part_idx`` (0-based position within the
    parent, geopandas' secondary index)."""
    parts = _parts_udf()(F.col(geom_col))
    other = [c for c in df.columns if c != geom_col]
    return (
        df.withColumn("_parts", parts)
        .select(
            *other,
            F.posexplode_outer("_parts").alias("part_idx", geom_col),
        )
        .select(*other, "part_idx", geom_col)
    )


@lru_cache(maxsize=8)
def _clip_udf(rect: tuple):
    @pandas_udf("binary")
    def clip_udf(wkb: pd.Series) -> pd.Series:
        from pyogrio_spark.geometry import measure as M

        x0, y0, x1, y1 = rect
        return pd.Series(
            [
                None if b is None else M.clip_by_rect(W.parse_wkb(bytes(b)), x0, y0, x1, y1)
                for b in wkb
            ]
        )

    return clip_udf


def clip_by_rect_column(
    x0: float, y0: float, x1: float, y1: float, geom_col: str = "geometry_wkb"
) -> Column:
    """shapely.clip_by_rect as a batch column — the tile-boundary
    operation (clip features to their tile's rectangle after
    assign_tiles). Null where nothing survives the window."""
    return _clip_udf((float(x0), float(y0), float(x1), float(y1)))(F.col(geom_col))


@lru_cache(maxsize=16)
def _affine_udf(matrix: tuple):
    @pandas_udf("binary")
    def aff_udf(wkb: pd.Series) -> pd.Series:
        from pyogrio_spark.geometry import measure as M

        return pd.Series(
            [None if b is None else M.affine_transform(W.parse_wkb(bytes(b)), matrix) for b in wkb]
        )

    return aff_udf


def affine_transform_column(matrix, geom_col: str = "geometry_wkb") -> Column:
    """shapely.affinity.affine_transform as a batch column —
    [a, b, d, e, xoff, yoff]; translate/scale/rotate compose into it."""
    return _affine_udf(tuple(float(v) for v in matrix))(F.col(geom_col))


@lru_cache(maxsize=4)
def _reproject_udf(direction: str):
    @pandas_udf("binary")
    def reproj_udf(wkb: pd.Series) -> pd.Series:
        from pyogrio_spark.geometry import measure as M

        fn = M.lonlat_to_mercator if direction == "to_3857" else M.mercator_to_lonlat
        return pd.Series(
            [
                None if b is None else M.transform_geom(W.parse_wkb(bytes(b)), fn)
                for b in wkb
            ]
        )

    return reproj_udf


def reproject_column(to: str, geom_col: str = "geometry_wkb") -> Column:
    """GeoSeries.to_crs for the supported closed-form pair:
    'EPSG:3857' (from 4326) or 'EPSG:4326' (from 3857). Arbitrary CRS
    pairs need a PROJ database — documented divergence (crs.py).
    Point-coordinate columns should prefer the pure-codegen
    mercator_x_expr/mercator_y_expr (no Python at all)."""
    code = str(to).upper().replace("EPSG:", "")
    if code == "3857":
        return _reproject_udf("to_3857")(F.col(geom_col))
    if code == "4326":
        return _reproject_udf("to_4326")(F.col(geom_col))
    raise ValueError(f"unsupported reprojection target {to!r} (EPSG:3857/EPSG:4326)")


@lru_cache(maxsize=1)
def _bounds_udf():
    @pandas_udf("xmin double, ymin double, xmax double, ymax double")
    def bounds_udf(wkb: pd.Series) -> pd.DataFrame:
        b = W.bounds_many(wkb.to_numpy())
        return pd.DataFrame({"xmin": b[:, 0], "ymin": b[:, 1], "xmax": b[:, 2], "ymax": b[:, 3]})

    return bounds_udf


def bounds_columns(df: DataFrame, geom_col: str = "geometry_wkb") -> DataFrame:
    """Attach envelope columns — the ``read_bounds`` kernel
    (/root/reference/pyogrio/_io.pyx:1561-1605) as a derive-once step;
    afterwards all spatial prefilters are plain column predicates."""
    b = _bounds_udf()(F.col(geom_col))
    return (
        df.withColumn("_b", b)
        .withColumn("xmin", F.col("_b.xmin"))
        .withColumn("ymin", F.col("_b.ymin"))
        .withColumn("xmax", F.col("_b.xmax"))
        .withColumn("ymax", F.col("_b.ymax"))
        .drop("_b")
    )


@lru_cache(maxsize=1)
def _lonlat_udf():
    @pandas_udf("lon double, lat double")
    def lonlat_udf(wkb: pd.Series) -> pd.DataFrame:
        lon, lat = W.decode_points(wkb.to_numpy(), on_invalid="ignore")
        return pd.DataFrame({"lon": lon, "lat": lat})

    return lonlat_udf


def point_lonlat_columns(df: DataFrame, geom_col: str = "geometry_wkb") -> DataFrame:
    p = _lonlat_udf()(F.col(geom_col))
    return df.withColumn("_p", p).withColumn("lon", F.col("_p.lon")).withColumn("lat", F.col("_p.lat")).drop("_p")


@lru_cache(maxsize=1)
def _geom_type_udf():
    @pandas_udf("string")
    def geom_type_udf(wkb: pd.Series) -> pd.Series:
        return pd.Series([W.geom_type_name(bytes(b)) if b is not None else None for b in wkb])

    return geom_type_udf


def geom_type_column(geom_col: str = "geometry_wkb") -> Column:
    """Per-row geometry type name (reference: geopandas.py:681 geom_type;
    header peek only, cf. /root/reference/pyogrio/_io.pyx:3073-3086)."""
    return _geom_type_udf()(F.col(geom_col))


@lru_cache(maxsize=1)
def _point_wkb_udf():
    @pandas_udf("binary")
    def point_wkb_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(W.encode_points(lon.to_numpy(np.float64), lat.to_numpy(np.float64)))

    return point_wkb_udf


def point_wkb_column(lon_col: str, lat_col: str) -> Column:
    """Encode (lon, lat) into 21-byte WKB points — the write-side analogue
    of the reference's geometry import (/root/reference/pyogrio/_io.pyx:3072-3098)."""
    return _point_wkb_udf()(F.col(lon_col), F.col(lat_col))


@lru_cache(maxsize=1)
def _rect_wkb_udf():
    @pandas_udf("binary")
    def rect_wkb_udf(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            W.encode_rects(
                xmin.to_numpy(np.float64), ymin.to_numpy(np.float64),
                xmax.to_numpy(np.float64), ymax.to_numpy(np.float64),
            )
        )

    return rect_wkb_udf


def rect_wkb_column(xmin_col: str, ymin_col: str, xmax_col: str, ymax_col: str) -> Column:
    """Encode envelope corners into rectangle-polygon WKB (vectorized)."""
    return _rect_wkb_udf()(F.col(xmin_col), F.col(ymin_col), F.col(xmax_col), F.col(ymax_col))


@lru_cache(maxsize=1)
def _tri_wkb_udf():
    @pandas_udf("binary")
    def tri_wkb_udf(
        x0: pd.Series, y0: pd.Series, x1: pd.Series, y1: pd.Series, x2: pd.Series, y2: pd.Series
    ) -> pd.Series:
        import numpy as np

        return pd.Series(
            W.encode_triangles(*(s.to_numpy(np.float64) for s in (x0, y0, x1, y1, x2, y2)))
        )

    return tri_wkb_udf


def tri_wkb_column(x0, y0, x1, y1, x2, y2) -> Column:
    """Encode per-row triangle vertices into polygon WKB (vectorized)."""
    return _tri_wkb_udf()(F.col(x0), F.col(y0), F.col(x1), F.col(y1), F.col(x2), F.col(y2))


def span_digest(spans_col: str = "spans") -> Column:
    """Canonical digest of the interleaved span sequence. Stage-boundary
    checks compare this digest to prove the per-row invariant (kind, text,
    media_ref, order) survived byte-identically. JSON canonicalization is
    deterministic for a fixed struct schema; computed JVM-side."""
    return F.md5(F.to_json(F.col(spans_col)))
