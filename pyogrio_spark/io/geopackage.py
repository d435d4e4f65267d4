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


def _srs_display(con, srs_id) -> str | None:
    """srs_id -> reference-convention CRS string: 'EPSG:<code>' when the
    registry row carries an EPSG organization (or the definition WKT
    identifies), else the definition WKT itself."""
    from pyogrio_spark.crs import display_crs

    if srs_id is None or srs_id <= 0:
        return None
    row = con.execute(
        "SELECT organization, organization_coordsys_id, definition "
        "FROM gpkg_spatial_ref_sys WHERE srs_id = ?",
        (srs_id,),
    ).fetchone()
    if row is None:
        return f"EPSG:{srs_id}"
    org, org_id, definition = row
    if (org or "").upper() == "EPSG" and org_id:
        return f"EPSG:{org_id}"
    disp = display_crs(definition) if definition and definition != "undefined" else None
    return disp or f"EPSG:{srs_id}"


def _sqlite_dtype(decl: str) -> str:
    """GPKG declared type -> the numpy dtype name the engine surfaces."""
    if decl in ("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BOOLEAN"):
        return "int64"
    if decl == "FLOAT":
        return "float32"
    if decl in ("REAL", "DOUBLE"):
        return "float64"
    return "object"


def geopackage_info(path: str, layer: str | None = None) -> dict:
    """read_info fields from the REGISTRY tables only (gpkg_contents
    bounds, gpkg_geometry_columns type/srs, table_info decls) plus an
    sqlite COUNT(*) (B-tree walk, no geometry decode) — the metadata
    cost profile the reference's GPKG driver capabilities advertise
    (fast_feature_count/fast_total_bounds). Dtypes are DECL-derived, so
    nullable integer columns report int64, not post-pandas float64."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        layers = list_layers(path)
        if not layers:
            raise ValueError(f"no feature layers in {path}")
        if layer is None:
            layer = layers[0][0]
        gcol, gtype, srs, zflag = con.execute(
            "SELECT column_name, geometry_type_name, srs_id, z FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,),
        ).fetchone()
        bounds_row = con.execute(
            "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents WHERE table_name = ?",
            (layer,),
        ).fetchone()
        tinfo = list(con.execute(f'PRAGMA table_info("{layer}")'))
        pk = next((r[1] for r in tinfo if r[5] == 1), tinfo[0][1])
        attrs = [(r[1], (r[2] or "").upper()) for r in tinfo if r[1] not in (pk, gcol)]
        (nrec,) = con.execute(f'SELECT COUNT(*) FROM "{layer}"').fetchone()
        crs = _srs_display(con, srs)
        # layer metadata: GDAL surfaces gpkg_contents identifier/
        # description as IDENTIFIER/DESCRIPTION, plus any gpkg_metadata
        # rows referenced at table scope (reference returns these dicts
        # from read_info; _io.pyx:2391-2397)
        ident_row = con.execute(
            "SELECT identifier, description FROM gpkg_contents WHERE table_name = ?",
            (layer,),
        ).fetchone()
        layer_md: dict = {}
        if ident_row:
            if ident_row[0] and ident_row[0] != layer:
                layer_md["IDENTIFIER"] = ident_row[0]
            if ident_row[1]:
                layer_md["DESCRIPTION"] = ident_row[1]
        dataset_md: dict = {}
        has_md = con.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name='gpkg_metadata'"
        ).fetchone()
        if has_md:
            import json as _json

            for scope, table_name, md in con.execute(
                "SELECT r.reference_scope, r.table_name, m.metadata "
                "FROM gpkg_metadata_reference r JOIN gpkg_metadata m ON m.id = r.md_file_id"
            ):
                target = dataset_md if scope == "geopackage" else (
                    layer_md if table_name == layer else None
                )
                if target is None:
                    continue
                try:  # JSON rows (our writer's layout) merge as key/value pairs
                    parsed = _json.loads(md)
                except (ValueError, TypeError):
                    parsed = None
                if isinstance(parsed, dict) and all(isinstance(v, str) for v in parsed.values()):
                    target.update(parsed)
                else:
                    target["GPKG_METADATA_ITEM_%d" % len(target)] = md
        has_rtree = con.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name = ?",
            (f"rtree_{layer}_{gcol}",),
        ).fetchone() is not None
    finally:
        con.close()
    total_bounds = (
        tuple(float(v) for v in bounds_row)
        if bounds_row is not None and all(v is not None for v in bounds_row)
        else None
    )
    return {
        "layer_name": layer,
        "features": int(nrec),
        "fields": [n for n, _ in attrs],
        "dtypes": [_sqlite_dtype(d) for _, d in attrs],
        "total_bounds": total_bounds,
        "geometry_type": _GPKG_TYPE.get((gtype or "").upper(), gtype)
        + (" Z" if zflag == 1 else ""),
        "crs": crs,
        "encoding": "UTF-8",
        "fid_column": pk,
        "geometry_name": gcol,
        "layer_metadata": layer_md or None,
        "dataset_metadata": dataset_md or None,
        "has_spatial_index": has_rtree,
    }


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
    con2 = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        crs = _srs_display(con2, srs)
    finally:
        con2.close()
    info = {
        "layer_name": layer,
        "features": len(pdf),
        "fields": [c for c in pdf.columns if c not in ("fid", "geometry_wkb")],
        "geometry_type": inferred,
        "crs": crs,
        "encoding": "UTF-8",
    }
    return pdf, info


_DTYPE_TO_GPKG = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "MEDIUMINT", "int64": "INTEGER",
    "uint8": "TINYINT", "uint16": "SMALLINT", "uint32": "MEDIUMINT", "uint64": "INTEGER",
    "float32": "FLOAT", "float64": "REAL", "bool": "BOOLEAN", "object": "TEXT",
}


def write_geopackage(
    pdf: pd.DataFrame,
    path: str,
    layer: str = "layer",
    geom_col: str = "geometry_wkb",
    geometry_type: str | None = None,
    srs_id: int | None = None,
    crs=None,
    append: bool = False,
    spatial_index: bool = True,
    layer_metadata: dict | None = None,
    dataset_metadata: dict | None = None,
) -> None:
    """Write a frame with a WKB geometry column as a valid GeoPackage:
    standard registry tables + GP-headered geometry blobs (envelope
    indicator 1, little-endian). The write-side half of the reference's
    round-trip contract — ``read_geopackage_pdf(write_geopackage(df))``
    returns the same rows, and external GPKG readers see a conformant
    file.

    ``crs`` (int EPSG / 'EPSG:<n>' / WKT, default EPSG:4326) is
    registered in ``gpkg_spatial_ref_sys`` and referenced by the layer
    — the reference persists the caller's CRS (_io.pyx:2810-2816). A
    WKT that doesn't identify to an EPSG code registers as a custom SRS
    (organization NONE, srs_id 100000). ``srs_id`` remains as a
    back-compat alias for an EPSG code.

    ``append=True`` INSERTs into the existing layer table (schema must
    match) and widens the gpkg_contents bounds — the reference's
    write_dataframe(append=True) semantics (raw.py:668).

    ``spatial_index=True`` (the GDAL default) writes the standard
    ``gpkg_rtree_index`` extension: an SQLite R*Tree virtual table over
    the feature envelopes, registered in ``gpkg_extensions`` — the
    driver capability behind OLCFastSpatialFilter, which the
    distributed scan uses for bbox byte-range pruning.

    ``layer_metadata`` / ``dataset_metadata`` (str->str dicts, the
    reference's write surface, _io.pyx:2873-2874): IDENTIFIER and
    DESCRIPTION map onto the gpkg_contents columns; remaining pairs are
    stored as one JSON gpkg_metadata row at table/geopackage scope and
    round-trip through ``geopackage_info``."""
    import os as _os

    if append:
        if not _os.path.exists(path):
            raise ValueError(f"append=True but {path} does not exist")
        return _append_geopackage(pdf, path, layer=layer, geom_col=geom_col)
    from pyogrio_spark.crs import crs_to_epsg, crs_to_wkt

    if crs is None:
        crs = srs_id if srs_id is not None else 4326
    epsg = crs_to_epsg(crs)
    if epsg is not None:
        srs_id = epsg
        srs_row = (f"EPSG:{epsg}", epsg, "EPSG", epsg, crs_to_wkt(epsg))
    else:  # unidentifiable WKT: custom SRS entry carrying the definition
        srs_id = 100000
        srs_row = ("custom", 100000, "NONE", 100000, str(crs))
    geoms = list(pdf[geom_col])
    if geometry_type is None:
        seen = {W.geom_type_name(g) for g in geoms if g is not None}
        geometry_type = next(iter(seen)).split(" ")[0].upper() if len(seen) == 1 else "GEOMETRY"

    bounds = [W.bounds(g) for g in geoms if g is not None]
    if bounds:
        arr = np.array(bounds)
        minx, miny = float(arr[:, 0].min()), float(arr[:, 1].min())
        maxx, maxy = float(arr[:, 2].max()), float(arr[:, 3].max())
    else:
        minx = miny = maxx = maxy = 0.0

    import struct as _s

    def to_blob(wkb: bytes | None) -> bytes | None:
        if wkb is None:
            return None
        x0, y0, x1, y1 = W.bounds(wkb)
        # flags 0x03: little-endian header, envelope indicator 1 (xy)
        return b"GP\x00\x03" + _s.pack("<i", srs_id) + _s.pack("<4d", x0, x1, y0, y1) + wkb

    attrs = [c for c in pdf.columns if c != geom_col]
    cols_sql = ", ".join(f'"{c}" {_DTYPE_TO_GPKG.get(str(pdf[c].dtype), "TEXT")}' for c in attrs if c != "fid")

    con = sqlite3.connect(path)
    try:
        cur = con.cursor()
        cur.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
        cur.execute("PRAGMA user_version = 10300")
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)"
        )
        cur.executemany(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?, ?, ?, ?, ?, NULL)",
            [
                # spec-mandated baseline rows (undefined + WGS84) ...
                ("Undefined cartesian SRS", -1, "NONE", -1, "undefined"),
                ("Undefined geographic SRS", 0, "NONE", 0, "undefined"),
                ("EPSG:4326", 4326, "EPSG", 4326, crs_to_wkt(4326)),
                # ... plus the layer's actual SRS
                srs_row,
            ],
        )
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents (table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, "
            "identifier TEXT UNIQUE, description TEXT DEFAULT '', last_change DATETIME, "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"
        )
        cur.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (table_name TEXT UNIQUE NOT NULL, "
            "column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL, PRIMARY KEY (table_name, column_name))"
        )
        cur.execute(
            f'CREATE TABLE "{layer}" (fid INTEGER PRIMARY KEY AUTOINCREMENT, "{geom_col}" BLOB'
            + (", " + cols_sql if cols_sql else "")
            + ")"
        )
        cur.execute(
            "INSERT INTO gpkg_contents (table_name, data_type, identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?, 'features', ?, ?, ?, ?, ?, ?)",
            (layer, layer, minx, miny, maxx, maxy, srs_id),
        )
        cur.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, ?, ?, ?, 0, 0)",
            (layer, geom_col, geometry_type, srs_id),
        )
        data_cols = [c for c in attrs if c != "fid"]
        ph = ", ".join(["?"] * (1 + len(data_cols)))
        col_names = f'"{geom_col}"' + ("".join(f', "{c}"' for c in data_cols))
        rows = [
            (to_blob(g), *[None if pd.isna(v) else (int(v) if isinstance(v, (bool, np.bool_)) else v.item() if isinstance(v, np.generic) else v) for v in vals])
            for g, vals in zip(geoms, pdf[data_cols].itertuples(index=False, name=None) if data_cols else [()] * len(geoms))
        ]
        cur.executemany(f'INSERT INTO "{layer}" ({col_names}) VALUES ({ph})', rows)
        if spatial_index:
            _write_rtree(cur, layer, geom_col, start_fid=1, geoms=geoms)
        _write_metadata(cur, layer, layer_metadata, dataset_metadata)
        con.commit()
    finally:
        con.close()


def _write_rtree(cur, layer: str, geom_col: str, start_fid: int, geoms) -> None:
    """gpkg_rtree_index extension: R*Tree virtual table over feature
    envelopes (ids = fids), registered in gpkg_extensions."""
    rt = f"rtree_{layer}_{geom_col}"
    cur.execute(
        f'CREATE VIRTUAL TABLE IF NOT EXISTS "{rt}" USING rtree(id, minx, maxx, miny, maxy)'
    )
    cur.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_extensions (table_name TEXT, column_name TEXT, "
        "extension_name TEXT NOT NULL, definition TEXT NOT NULL, scope TEXT NOT NULL, "
        "CONSTRAINT ge_tce UNIQUE (table_name, column_name, extension_name))"
    )
    cur.execute(
        "INSERT OR IGNORE INTO gpkg_extensions VALUES (?, ?, 'gpkg_rtree_index', "
        "'http://www.geopackage.org/spec120/#extension_rtree', 'write-only')",
        (layer, geom_col),
    )
    entries = []
    for i, g in enumerate(geoms):
        if g is None:
            continue
        x0, y0, x1, y1 = W.bounds(g)
        entries.append((start_fid + i, x0, x1, y0, y1))
    cur.executemany(f'INSERT INTO "{rt}" VALUES (?, ?, ?, ?, ?)', entries)


def _write_metadata(cur, layer: str, layer_metadata, dataset_metadata) -> None:
    import json as _json

    for md in (layer_metadata, dataset_metadata):
        if md is None:
            continue
        for k, v in md.items():
            if not isinstance(k, str) or not isinstance(v, str):
                raise ValueError("metadata must be a dict of strings")
    if layer_metadata:
        layer_metadata = dict(layer_metadata)
        ident = layer_metadata.pop("IDENTIFIER", None)
        desc = layer_metadata.pop("DESCRIPTION", None)
        if ident is not None:
            cur.execute(
                "UPDATE gpkg_contents SET identifier = ? WHERE table_name = ?", (ident, layer)
            )
        if desc is not None:
            cur.execute(
                "UPDATE gpkg_contents SET description = ? WHERE table_name = ?", (desc, layer)
            )
    pairs = [(layer_metadata, "table", layer), (dataset_metadata, "geopackage", None)]
    if not any(md for md, *_ in pairs):
        return
    cur.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_metadata (id INTEGER PRIMARY KEY, md_scope TEXT NOT NULL, "
        "md_standard_uri TEXT NOT NULL, mime_type TEXT NOT NULL, metadata TEXT NOT NULL)"
    )
    cur.execute(
        "CREATE TABLE IF NOT EXISTS gpkg_metadata_reference (reference_scope TEXT NOT NULL, "
        "table_name TEXT, column_name TEXT, row_id_value INTEGER, "
        "timestamp DATETIME DEFAULT CURRENT_TIMESTAMP, md_file_id INTEGER NOT NULL, md_parent_id INTEGER)"
    )
    for md, scope, tname in pairs:
        if not md:
            continue
        cur.execute(
            "INSERT INTO gpkg_metadata (md_scope, md_standard_uri, mime_type, metadata) "
            "VALUES ('dataset', 'http://www.json.org', 'application/json', ?)",
            (_json.dumps(md, sort_keys=True),),
        )
        cur.execute(
            "INSERT INTO gpkg_metadata_reference (reference_scope, table_name, md_file_id) "
            "VALUES (?, ?, last_insert_rowid())",
            (scope, tname),
        )


def _append_geopackage(
    pdf: pd.DataFrame, path: str, layer: str = "layer", geom_col: str = "geometry_wkb"
) -> None:
    """INSERT new features into an existing GPKG layer: same blob
    encoding as the fresh write, layer srs_id reused, gpkg_contents
    bounds widened to cover the union."""
    import struct as _s

    con = sqlite3.connect(path)
    try:
        row = con.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns WHERE table_name = ?",
            (layer,),
        ).fetchone()
        if row is None:
            raise ValueError(f"append=True: layer {layer!r} not found in {path}")
        gcol, srs_id = row
        tinfo = list(con.execute(f'PRAGMA table_info("{layer}")'))
        pk = next((r[1] for r in tinfo if r[5] == 1), tinfo[0][1])
        existing = [r[1] for r in tinfo if r[1] not in (pk, gcol)]
        incoming = [c for c in pdf.columns if c not in (geom_col, "fid")]
        if set(incoming) != set(existing):
            raise ValueError(
                f"append=True: column mismatch — layer has {existing}, frame has {incoming}"
            )

        geoms = list(pdf[geom_col])

        def to_blob(wkb: bytes | None) -> bytes | None:
            if wkb is None:
                return None
            x0, y0, x1, y1 = W.bounds(wkb)
            return b"GP\x00\x03" + _s.pack("<i", srs_id) + _s.pack("<4d", x0, x1, y0, y1) + wkb

        ph = ", ".join(["?"] * (1 + len(existing)))
        col_names = f'"{gcol}"' + ("".join(f', "{c}"' for c in existing))
        rows = [
            (to_blob(g), *[None if pd.isna(v) else (int(v) if isinstance(v, (bool, np.bool_)) else v.item() if isinstance(v, np.generic) else v) for v in vals])
            for g, vals in zip(geoms, pdf[existing].itertuples(index=False, name=None) if existing else [()] * len(geoms))
        ]
        prev_max = con.execute(f'SELECT COALESCE(MAX("{pk}"), 0) FROM "{layer}"').fetchone()[0]
        con.executemany(f'INSERT INTO "{layer}" ({col_names}) VALUES ({ph})', rows)
        # maintain the spatial index when present (one transaction, so
        # the appended fids are the consecutive range after prev_max)
        rt = f"rtree_{layer}_{gcol}"
        if con.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name = ?", (rt,)
        ).fetchone():
            _write_rtree(con.cursor(), layer, gcol, start_fid=int(prev_max) + 1, geoms=geoms)
        bounds = [W.bounds(g) for g in geoms if g is not None]
        if bounds:
            arr = np.array(bounds)
            con.execute(
                "UPDATE gpkg_contents SET min_x = min(min_x, ?), min_y = min(min_y, ?), "
                "max_x = max(max_x, ?), max_y = max(max_y, ?) WHERE table_name = ?",
                (float(arr[:, 0].min()), float(arr[:, 1].min()),
                 float(arr[:, 2].max()), float(arr[:, 3].max()), layer),
            )
        con.commit()
    finally:
        con.close()


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


def read_geopackage_distributed(
    spark, path: str, layer: str | None = None, chunk_rows: int = 100_000, **read_table_kwargs
):
    """Distributed GPKG scan: the driver reads only the registry tables
    and the layer's primary-key range; executors each open the SQLite
    file read-only and range-scan their own pk window inside
    mapInPandas — SQLite's rowid B-tree makes each range seek O(log n),
    so no task touches pages outside its chunk. Same shape as
    ``read_shapefile_distributed``; this is the multi-GB plan the
    single-node ``read_geopackage`` (fixture-scale interchange)
    deliberately skips. The path must be executor-visible.

    Typing: Spark-schema-first — INTEGER-family columns come back as
    nullable BIGINT (per-chunk nulls carried via pandas Int64), FLOAT as
    float, REAL/DOUBLE as double; the pandas reader's null-typing parity
    conventions (nullable ints -> float64) apply to the single-node
    interchange path only."""
    from pyspark.sql import functions as F  # noqa: F811 (local, matches module import)

    from pyogrio_spark.io.reader import read_table

    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        layers = list_layers(path)
        if not layers:
            raise ValueError(f"no feature layers in {path}")
        if layer is None:
            layer = layers[0][0]
        (gcol,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?", (layer,)
        ).fetchone()
        tinfo = list(con.execute(f'PRAGMA table_info("{layer}")'))
        pk = next((r[1] for r in tinfo if r[5] == 1), "rowid")
        decl = {r[1]: (r[2] or "").upper() for r in tinfo}
        attrs = [r[1] for r in tinfo if r[1] not in (pk, gcol)]
        lo_hi = con.execute(f'SELECT min("{pk}"), max("{pk}") FROM "{layer}"').fetchone()
        # bbox pushdown to the STORAGE layer: when the file carries the
        # gpkg_rtree_index extension, prune whole pk ranges on the
        # driver from the R-tree (superset of the exact answer —
        # read_table's bbox refine still runs on what is read). Same
        # plan shape as the FlatGeobuf leaf-bbox pruning.
        cand_ids = None
        bbox = read_table_kwargs.get("bbox")
        if bbox is None and read_table_kwargs.get("mask") is not None:
            # a mask filter prunes by its envelope too (superset; the
            # exact mask refine still runs in read_table)
            bbox = W.bounds(bytes(read_table_kwargs["mask"]))
        rt = f"rtree_{layer}_{gcol}"
        if bbox is not None and con.execute(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name = ?", (rt,)
        ).fetchone():
            qx0, qy0, qx1, qy1 = bbox
            cand_ids = np.array(
                [r[0] for r in con.execute(
                    f'SELECT id FROM "{rt}" WHERE maxx >= ? AND minx <= ? '
                    "AND maxy >= ? AND miny <= ? ORDER BY id",
                    (qx0, qx1, qy0, qy1),
                )],
                dtype=np.int64,
            )
    finally:
        con.close()
    if lo_hi[0] is None:
        raise ValueError(f"{path}:{layer} is empty")
    lo, hi = int(lo_hi[0]), int(lo_hi[1])

    if cand_ids is not None:
        runs = (
            np.split(cand_ids, np.flatnonzero(np.diff(cand_ids) > 1) + 1)
            if len(cand_ids)
            else []
        )
        chunks = []
        ci = 0
        for run in runs:
            for seg_lo in range(0, len(run), int(chunk_rows)):
                seg = run[seg_lo : seg_lo + int(chunk_rows)]
                chunks.append((ci, int(seg[0]), int(seg[-1])))
                ci += 1
        if not chunks:  # bbox pruned everything: empty range
            chunks = [(0, lo, lo - 1)]
    else:
        chunks = [
            (ci, start, min(start + int(chunk_rows) - 1, hi))
            for ci, start in enumerate(range(lo, hi + 1, int(chunk_rows)))
        ]
    chunk_df = spark.createDataFrame(
        chunks, schema="chunk_id int, pk_lo long, pk_hi long"
    ).repartition(len(chunks), F.col("chunk_id"))

    def _spark_type(c: str) -> str:
        d = decl.get(c, "")
        if d in ("TINYINT", "SMALLINT", "MEDIUMINT", "INT", "INTEGER", "BOOLEAN"):
            return "bigint"
        if d == "FLOAT":
            return "float"
        if d in ("REAL", "DOUBLE"):
            return "double"
        if d == "BLOB":
            return "binary"
        return "string"

    schema = ", ".join(
        ["`fid` bigint"]
        + [f"`{c}` {_spark_type(c)}" for c in attrs]
        + ["`geometry_wkb` binary"]
    )
    sel = ", ".join([f'"{pk}"'] + [f'"{c}"' for c in attrs] + [f'"{gcol}"'])

    def scan(pdfs):
        for cpdf in pdfs:
            for row in cpdf.itertuples(index=False):
                c = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
                try:
                    rows = c.execute(
                        f'SELECT {sel} FROM "{layer}" WHERE "{pk}" BETWEEN ? AND ? ORDER BY "{pk}"',
                        (int(row.pk_lo), int(row.pk_hi)),
                    ).fetchall()
                finally:
                    c.close()
                out = pd.DataFrame(
                    {"fid": pd.array([r[0] for r in rows], dtype="Int64")}
                )
                for i, cname in enumerate(attrs, start=1):
                    vals = [r[i] for r in rows]
                    t = _spark_type(cname)
                    if t == "bigint":
                        out[cname] = pd.array(vals, dtype="Int64")
                    elif t in ("float", "double"):
                        out[cname] = pd.array(
                            [np.nan if v is None else v for v in vals], dtype="float64"
                        )
                    else:
                        out[cname] = vals
                out["geometry_wkb"] = [gpkg_blob_to_wkb(r[-1]) for r in rows]
                yield out

    df = chunk_df.mapInPandas(scan, schema=schema)
    return read_table(spark, df, **read_table_kwargs)
