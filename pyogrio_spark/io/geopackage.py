"""Pure-Python GeoPackage source (SQLite container + GPKG geometry blobs).

GPKG is an OGC standard: an SQLite database with ``gpkg_contents`` /
``gpkg_geometry_columns`` registry tables and a documented geometry
BLOB header (magic 'GP', flags byte with an envelope indicator,
srs_id, then ISO WKB). Python's stdlib sqlite3 reads the container;
the engine's WKB codec handles the payload — including curve types,
which parse to their linear downgrades exactly like the reference's
scan (list_layers on curve.gpkg reports LineString,
/root/reference/pyogrio/tests/test_core.py:311-316).

Null typing parity with the reference's raw read
(/root/reference/pyogrio/tests/test_raw_io.py:968-979): numeric
columns containing nulls surface as float64 with NaN (float32 stays
float32); null-free integer columns stay int64.

Scale note: like the shapefile source, parsing happens on the driver —
GPKG is a dimension-sized interchange format here; bulk fact data is
parquet. A rowid-range mapInPandas split is the scale path.
"""

from __future__ import annotations

import sqlite3

import numpy as np
import pandas as pd

from pyogrio_spark.geometry import wkb as W

# gpkg_geometry_columns type name -> reported (downgraded) layer type
_GPKG_TYPE = {
    "POINT": "Point",
    "LINESTRING": "LineString",
    "POLYGON": "Polygon",
    "MULTIPOINT": "MultiPoint",
    "MULTILINESTRING": "MultiLineString",
    "MULTIPOLYGON": "MultiPolygon",
    "GEOMETRYCOLLECTION": "GeometryCollection",
    "CIRCULARSTRING": "LineString",
    "COMPOUNDCURVE": "LineString",
    "CURVE": "LineString",
    "CURVEPOLYGON": "Polygon",
    "SURFACE": "Polygon",
    "MULTICURVE": "MultiLineString",
    "MULTISURFACE": "MultiPolygon",
    "GEOMETRY": "Unknown",
}

_ENVELOPE_LEN = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def gpkg_blob_to_wkb(blob: bytes | None) -> bytes | None:
    """GPKG geometry BLOB -> the ISO WKB it wraps."""
    if blob is None:
        return None
    if blob[:2] != b"GP":
        raise ValueError("not a GPKG geometry blob")
    env_ind = (blob[3] >> 1) & 0x07
    return bytes(blob[8 + _ENVELOPE_LEN[env_ind]:])


def list_layers(path: str) -> list[list[str]]:
    """[[layer_name, geometry_type], ...] — curve/surface layers report
    their linear downgrade, matching the reference."""
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT c.table_name, g.geometry_type_name FROM gpkg_contents c "
            "LEFT JOIN gpkg_geometry_columns g ON g.table_name = c.table_name "
            "WHERE c.data_type = 'features'"
        ).fetchall()
    finally:
        con.close()
    return [[t, _GPKG_TYPE.get((g or "").upper(), g)] for t, g in rows]


def read_geopackage_pdf(path: str, layer: str | None = None) -> tuple[pd.DataFrame, dict]:
    """One GPKG feature layer -> (pandas frame with fid/attrs/geometry_wkb,
    info dict). Defaults to the first (only) feature layer."""
    con = sqlite3.connect(path)
    try:
        layers = list_layers(path)
        if not layers:
            raise ValueError(f"no feature layers in {path}")
        if layer is None:
            layer = layers[0][0]
        gcol, gtype, srs = con.execute(
            "SELECT column_name, geometry_type_name, srs_id FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,),
        ).fetchone()
        decl = {r[1]: (r[2] or "").upper() for r in con.execute(f'PRAGMA table_info("{layer}")')}
        cur = con.execute(f'SELECT * FROM "{layer}"')
        names = [d[0] for d in cur.description]
        rows = cur.fetchall()
    finally:
        con.close()

    data = {n: [r[i] for r in rows] for i, n in enumerate(names)}
    geoms = [gpkg_blob_to_wkb(b) for b in data.pop(gcol)]
    fid_col = names[0]  # GPKG primary key (fid) is the first column
    pdf = pd.DataFrame(data)

    # reference null-typing parity: nullable numerics -> float64 (NaN),
    # FLOAT stays float32, null-free integers stay int64
    for c in pdf.columns:
        if c == fid_col:
            pdf[c] = pdf[c].astype("int64")
            continue
        d = decl.get(c, "")
        if d in ("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BOOLEAN"):
            pdf[c] = pdf[c].astype("int64") if pdf[c].notna().all() else pdf[c].astype("float64")
        elif d == "FLOAT":
            pdf[c] = pdf[c].astype("float32")
        elif d in ("REAL", "DOUBLE"):
            pdf[c] = pdf[c].astype("float64")
    pdf = pdf.rename(columns={fid_col: "fid"})
    pdf["geometry_wkb"] = geoms

    # keep the " Z" suffix: the reference reports e.g. "LineString Z"
    # for 3-D layers (test_core.py:304-310)
    seen = {W.geom_type_name(g) for g in geoms if g is not None}
    if len(seen) == 1:
        inferred = next(iter(seen))
    elif seen <= {"Polygon", "MultiPolygon"}:
        inferred = "MultiPolygon"
    else:
        inferred = _GPKG_TYPE.get((gtype or "").upper(), "Unknown")
    info = {
        "layer_name": layer,
        "features": len(pdf),
        "fields": [c for c in pdf.columns if c not in ("fid", "geometry_wkb")],
        "geometry_type": inferred,
        "crs": f"EPSG:{srs}" if srs and srs > 0 else None,
        "encoding": "UTF-8",
    }
    return pdf, info


def read_geopackage(spark, path: str, layer: str | None = None, **read_table_kwargs):
    """GPKG layer -> engine DataFrame, composable with read_table filters."""
    from pyogrio_spark.io.reader import read_table

    pdf, _ = read_geopackage_pdf(path, layer)
    fields = []
    for c in pdf.columns:
        if c == "geometry_wkb":
            fields.append(f"`{c}` binary")
        elif pdf[c].dtype == np.int64:
            fields.append(f"`{c}` bigint")
        elif pdf[c].dtype == np.float32:
            fields.append(f"`{c}` float")
        elif pdf[c].dtype == np.float64:
            fields.append(f"`{c}` double")
        else:
            fields.append(f"`{c}` string")
    df = spark.createDataFrame(pdf, schema=", ".join(fields))
    return read_table(spark, df, **read_table_kwargs)
