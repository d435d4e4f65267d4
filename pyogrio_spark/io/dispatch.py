"""Format dispatch: one pyogrio-style entry point over every source.

The reference's ``read_dataframe``/``read_info``/``list_layers`` accept
any path and let the driver registry pick the format
(/root/reference/pyogrio/raw.py:39-50). The engine's analogue routes by
extension to the native sources (Shapefile, GeoPackage, GeoJSON) or to
the Parquet/committed-table reader, and every route composes with the
full ``read_table`` filter surface (columns/where/bbox/mask/fids/
skip/max/force_2d/on_invalid).
"""

from __future__ import annotations

import os


def detect_format(path: str) -> str:
    low = str(path).lower()
    if low.endswith(".shp"):
        return "shapefile"
    if low.endswith((".gpkg", ".gpkg.zip")):
        return "geopackage"
    if low.endswith((".geojson", ".geojsonl", ".geojsons", ".json")):
        return "geojson"
    return "table"  # parquet directory or committed snapshot table


def open_table(spark, path, layer: str | None = None, **read_table_kwargs):
    """Any supported source -> engine DataFrame with read_table filters."""
    fmt = detect_format(path) if isinstance(path, (str, os.PathLike)) else "table"
    if fmt == "shapefile":
        from pyogrio_spark.io.shapefile import read_shapefile

        return read_shapefile(spark, str(path), **read_table_kwargs)
    if fmt == "geopackage":
        from pyogrio_spark.io.geopackage import read_geopackage

        return read_geopackage(spark, str(path), layer=layer, **read_table_kwargs)
    if fmt == "geojson":
        from pyogrio_spark.io.geojson import read_geojson

        return read_geojson(spark, str(path), **read_table_kwargs)
    from pyogrio_spark.io.reader import read_table

    return read_table(spark, path, **read_table_kwargs)


def dataset_layers(path: str) -> list[list[str]]:
    """[[layer_name, geometry_type], ...] for file-based sources."""
    fmt = detect_format(path)
    if fmt == "geopackage":
        from pyogrio_spark.io.geopackage import list_layers as gpkg_layers

        return gpkg_layers(path)
    if fmt == "shapefile":
        from pyogrio_spark.io.shapefile import read_shapefile_pdf

        _, info = read_shapefile_pdf(path)
        return [[info["layer_name"], info["geometry_type"]]]
    if fmt == "geojson":
        from pyogrio_spark.geometry import wkb as W
        from pyogrio_spark.io.geojson import read_geojson_pdf

        pdf = read_geojson_pdf(path)
        seen = {W.geom_type_name(b) for b in pdf.geometry_wkb if b is not None}
        name = os.path.splitext(os.path.basename(path))[0]
        if len(seen) == 1:
            t = next(iter(seen))
        elif seen <= {"Polygon", "MultiPolygon"}:
            t = "MultiPolygon"
        else:
            t = "Unknown"
        return [[name, t]]
    raise ValueError(f"dataset_layers needs a file-based source, got {path}")
