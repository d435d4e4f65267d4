"""Write-path geometry normalization: type inference + promote-to-multi.

Mirrors the reference's write_dataframe logic
(/root/reference/pyogrio/geopandas.py:679-740): the layer geometry type
is inferred from the data — a mix of Polygon and MultiPolygon promotes
the layer to MultiPolygon and every single-part geometry is promoted;
mixed incompatible types degrade to "Unknown" (GeometryCollection-ish).
The inference decision is one cheap distinct over a header peek (the
reference peeks WKB headers too, /root/reference/pyogrio/_io.pyx:3073-3086);
the rewrite is a vectorized batch pass.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyogrio_spark.geometry import wkb as W

_PROMOTABLE = {"Point": "MultiPoint", "LineString": "MultiLineString", "Polygon": "MultiPolygon"}
_MULTI = {"MultiPoint", "MultiLineString", "MultiPolygon"}
_MULTI_CODE = {"MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6}


def infer_layer_geometry_type(df: DataFrame, geom_col: str = "geometry_wkb") -> tuple[str, bool]:
    """-> (layer_geometry_type, promote_to_multi). Decision table per
    /root/reference/pyogrio/geopandas.py:700-740."""
    from pyogrio_spark.functions.geo import geom_type_column

    types = {
        r[0].replace(" Z", "") if r[0] else None
        for r in df.select(geom_type_column(geom_col).alias("t")).distinct().collect()
    }
    types.discard(None)
    if not types:
        return "Unknown", False
    if len(types) == 1:
        return next(iter(types)), False
    for single, multi in _PROMOTABLE.items():
        if types == {single, multi}:
            return multi, True
    return "Unknown", False


def _wrap_single_as_multi(buf: bytes) -> bytes:
    """Promote one single-part WKB geometry to its Multi counterpart by
    wrapping (header-level, no coordinate rewrite — the cheap path the
    reference takes via OGR_G_ForceToMultiPolygon, /root/reference/pyogrio/_io.pyx:3100-3111)."""
    name = W.geom_type_name(buf)
    base = name.replace(" Z", "") if name else None
    if base in _MULTI or base is None or base not in _PROMOTABLE:
        return buf
    multi_code = _MULTI_CODE[_PROMOTABLE[base]]
    if name.endswith(" Z"):
        multi_code += 1000
    return b"\x01" + struct.pack("<I", multi_code) + struct.pack("<I", 1) + bytes(buf)


@lru_cache(maxsize=1)
def _promote_udf():
    @pandas_udf("binary")
    def promote(wkb: pd.Series) -> pd.Series:
        return pd.Series([None if b is None else _wrap_single_as_multi(bytes(b)) for b in wkb])

    return promote


def promote_to_multi(df: DataFrame, geom_col: str = "geometry_wkb") -> DataFrame:
    return df.withColumn(geom_col, _promote_udf()(F.col(geom_col)))
