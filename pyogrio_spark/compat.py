"""pyogrio-shaped facade: the reference's public API surface with the
reference's signatures, backed by the Spark engine.

A pyogrio user switching to this repo can keep their call sites:

    from pyogrio_spark.compat import (
        read_dataframe, write_dataframe, read_info, read_bounds, list_layers)

Signature parity anchors: ``read_dataframe``
/root/reference/pyogrio/geopandas.py:138-161, ``read_info`` +
``read_bounds`` + ``list_layers`` /root/reference/pyogrio/core.py:152-327,
``write_dataframe`` /root/reference/pyogrio/geopandas.py:541-627.

Declared divergences (documented, not silent):
- The geometry column holds **WKB bytes**, not shapely objects — this
  container carries no GEOS. Returned frames are plain pandas; decode
  with ``pyogrio_spark.geometry.wkb`` or wrap with geopandas/shapely
  on your side (``gpd.GeoSeries.from_wkb``).
- ``sql_dialect``/``use_arrow``/``encoding``/``arrow_to_pandas_kwargs``
  are accepted and ignored: the dialect is Spark SQL (a superset of
  OGRSQL's operators), transfer is always Arrow, strings are UTF-8.
- These helpers run through a local SparkSession (created lazily, or
  pass ``spark=``) and collect to pandas — they are the reference's
  single-node interchange workflow; corpus-scale work should use
  ``open_table``/``read_table`` and stay distributed.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

_SPARK = None


def _spark(spark=None):
    global _SPARK
    if spark is not None:
        return spark
    if _SPARK is None:
        from pyogrio_spark.session import get_spark

        _SPARK = get_spark("pyogrio_compat", master="local[*]", shuffle_partitions=8)
    return _SPARK


def _norm_mask(mask):
    """Accept WKB bytes (engine-native) or a GeoJSON-like dict (the
    reference also takes shapely/GeoJSON, util.py:199-235)."""
    if mask is None or isinstance(mask, (bytes, bytearray)):
        return mask
    if isinstance(mask, dict):
        from pyogrio_spark.io.geojson import _coords_to_geom

        return _coords_to_geom(mask)
    raise TypeError("mask must be WKB bytes or a GeoJSON-like dict")


def read_dataframe(
    path_or_buffer,
    /,
    layer=None,
    encoding=None,
    columns=None,
    read_geometry=True,
    force_2d=False,
    skip_features=0,
    max_features=None,
    where=None,
    bbox=None,
    mask=None,
    fids=None,
    sql=None,
    sql_dialect=None,
    fid_as_index=False,
    use_arrow=None,
    on_invalid="raise",
    spark=None,
    **kwargs,
) -> pd.DataFrame:
    """Reference: read_dataframe (geopandas.py:138-476). Returns pandas
    with a ``geometry`` column of WKB bytes (see module divergences)."""
    from pyogrio_spark.io.dispatch import open_table

    df = open_table(
        _spark(spark),
        path_or_buffer,
        layer=layer,
        columns=list(columns) if columns is not None else None,
        read_geometry=read_geometry,
        where=where,
        bbox=tuple(bbox) if bbox is not None else None,
        mask=_norm_mask(mask),
        fids=list(fids) if fids is not None else None,
        skip_features=int(skip_features),
        max_features=max_features,
        sql=sql,
        force_2d=force_2d,
        on_invalid=on_invalid,
    )
    pdf = df.toPandas()
    if "geometry_wkb" in pdf.columns:
        pdf = pdf.rename(columns={"geometry_wkb": "geometry"})
        pdf["geometry"] = [None if b is None else bytes(b) for b in pdf["geometry"]]
    if fid_as_index and "fid" in pdf.columns:
        pdf = pdf.set_index("fid")
        pdf.index.name = "fid"
    return pdf


def list_layers(path_or_buffer, /) -> np.ndarray:
    """Reference: list_layers (core.py:152-169) — ndarray [[name, geometry_type], ...]."""
    from pyogrio_spark.io.dispatch import dataset_layers

    return np.array(dataset_layers(str(path_or_buffer)), dtype=object)


def read_info(
    path_or_buffer,
    /,
    layer=None,
    encoding=None,
    force_feature_count=False,
    force_total_bounds=False,
    spark=None,
    **kwargs,
) -> dict:
    """Reference: read_info (core.py:241-327) — same dict keys. OSM
    layers report features=-1 unless forced, like the reference's
    driver (test_core.py:676-688); file formats count eagerly (they
    are fixture-scale interchange here)."""
    from pyogrio_spark.geometry import wkb as W
    from pyogrio_spark.io.dispatch import dataset_layers, detect_format, open_table

    path = str(path_or_buffer)
    fmt = detect_format(path)
    if fmt == "osm":
        from pyogrio_spark.io.osm_pbf import osm_info

        info = osm_info(
            path, layer=layer, force_feature_count=force_feature_count,
            spark=_spark(spark) if force_feature_count else None,
        )
        return {
            "layer_name": info["layer_name"],
            "crs": "EPSG:4326",
            "encoding": "UTF-8",
            "fields": np.array([], dtype=object),
            "dtypes": np.array([], dtype=object),
            "geometry_type": info["geometry_type"],
            "features": info["features"],
            "total_bounds": None,
            "driver": info["driver"],
            "capabilities": {},
            "layer_metadata": None,
            "dataset_metadata": None,
        }
    layers = dataset_layers(path)
    if layer is None:
        name, gtype = layers[0]
    else:
        name, gtype = next(l for l in layers if l[0] == layer)
    df = open_table(_spark(spark), path, layer=layer)
    attr_cols = [c for c in df.columns if c not in ("fid", "geometry_wkb")]
    pdf = df.toPandas()
    total_bounds = None
    if "geometry_wkb" in pdf.columns:
        bs = W.bounds_many([None if b is None else bytes(b) for b in pdf.geometry_wkb])
        if len(bs):
            total_bounds = (
                float(np.nanmin(bs[:, 0])), float(np.nanmin(bs[:, 1])),
                float(np.nanmax(bs[:, 2])), float(np.nanmax(bs[:, 3])),
            )
    return {
        "layer_name": name,
        "crs": "EPSG:4326",
        "encoding": "UTF-8",
        "fields": np.array(attr_cols, dtype=object),
        "dtypes": np.array([str(pdf[c].dtype) for c in attr_cols], dtype=object),
        "geometry_type": gtype,
        "features": len(pdf),
        "total_bounds": total_bounds,
        "driver": fmt,
        "capabilities": {},
        "layer_metadata": None,
        "dataset_metadata": None,
    }


def read_bounds(
    path_or_buffer,
    /,
    layer=None,
    skip_features=0,
    max_features=None,
    where=None,
    bbox=None,
    mask=None,
    spark=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference: read_bounds (core.py:172-238) — (fids shape (n,),
    bounds shape (4, n))."""
    if max_features is not None and max_features < 0:
        raise ValueError("'max_features' must be >= 0")
    from pyogrio_spark.geometry import wkb as W
    from pyogrio_spark.io.dispatch import dataset_layers, open_table

    path = str(path_or_buffer)
    if layer is None and len(dataset_layers(path)) > 1:
        import warnings

        warnings.warn(
            f"More than one layer found in '{os.path.basename(path)}': using the first.",
            UserWarning,
            stacklevel=2,
        )
    df = open_table(
        _spark(spark), path, layer=layer, where=where,
        bbox=tuple(bbox) if bbox is not None else None, mask=_norm_mask(mask),
        skip_features=int(skip_features), max_features=max_features,
    )
    pdf = df.toPandas()
    fid_col = "fid" if "fid" in pdf.columns else None
    fids = (
        pdf[fid_col].to_numpy(dtype=np.int64)
        if fid_col
        else np.arange(len(pdf), dtype=np.int64)
    )
    bs = W.bounds_many([None if b is None else bytes(b) for b in pdf.geometry_wkb])
    bounds = bs.T if len(bs) else np.empty((4, 0))
    return fids, bounds


def write_dataframe(
    df: pd.DataFrame,
    path,
    /,
    layer=None,
    driver=None,
    encoding=None,
    geometry_column: str = "geometry",
    **kwargs,
) -> None:
    """Reference: write_dataframe (geopandas.py:541-627). ``df`` is
    pandas with WKB bytes in ``geometry`` (or ``geometry_wkb``);
    format from ``driver`` or the path extension."""
    path = str(path)
    pdf = df.copy()
    if geometry_column in pdf.columns and geometry_column != "geometry_wkb":
        pdf = pdf.rename(columns={geometry_column: "geometry_wkb"})
    if "geometry_wkb" not in pdf.columns:
        raise ValueError(f"no geometry column {geometry_column!r} in frame")
    low = path.lower()
    drv = (driver or "").lower()
    if drv in ("esri shapefile", "shapefile") or (not drv and low.endswith(".shp")):
        from pyogrio_spark.io.shapefile import write_shapefile

        write_shapefile(pdf, path)
    elif drv in ("gpkg", "geopackage") or (not drv and low.endswith(".gpkg")):
        from pyogrio_spark.io.geopackage import write_geopackage

        write_geopackage(pdf, path, layer=layer or "layer")
    elif drv in ("flatgeobuf",) or (not drv and low.endswith(".fgb")):
        from pyogrio_spark.io.flatgeobuf import write_flatgeobuf

        write_flatgeobuf(pdf, path, layer_name=layer, **kwargs)
    elif drv in ("geojson", "geojsonseq") or (
        not drv and low.endswith((".geojson", ".geojsonl", ".geojsons", ".json"))
    ):
        from pyogrio_spark.io.geojson import write_geojson

        write_geojson(pdf, path)
    else:
        raise ValueError(f"cannot infer driver for {path!r} (driver={driver!r})")
