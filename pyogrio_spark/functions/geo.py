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
