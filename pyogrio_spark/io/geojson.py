"""GeoJSON source + sink (RFC 7946, stdlib json — no GDAL).

Covers both layouts the reference's driver matrix exercises
(/root/reference/pyogrio/tests/conftest.py:28-30): ``.geojson``
(FeatureCollection) and ``.geojsonl``/``.geojsons`` (GeoJSONSeq — one
feature per line, the streaming-friendly form). Geometries convert
to/from the engine's ISO WKB; coordinates are (lon, lat[, z]).

Scale note: a FeatureCollection must be parsed whole (driver-side,
dimension-sized inputs); GeoJSONSeq is line-splittable — a large
.geojsonl reads distributed via ``spark.read.text`` + a mapInPandas
feature parser (``read_geojson_seq_distributed``).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pandas as pd

from pyogrio_spark.geometry import wkb as W


def _crs_member(doc) -> str:
    """GeoJSON 'crs' member (2008 spec, still emitted by GDAL for
    non-WGS84 data) -> 'EPSG:<code>'; RFC 7946 files have none and are
    WGS84 by definition."""
    c = doc.get("crs") if isinstance(doc, dict) else None
    if isinstance(c, dict):
        name = (c.get("properties") or {}).get("name", "") or ""
        m = re.search(r"EPSG:{1,2}(\d+)", name)
        if m:
            return f"EPSG:{m.group(1)}"
    return "EPSG:4326"


def _list_dtype(vals: list) -> str | None:
    """Element-type a column whose non-null values are ALL lists,
    mirroring GDAL's OGR list typing for GeoJSON (reference
    tests/test_geopandas_io.py:390-509): uniform int lists ->
    Integer64List, numeric -> RealList, strings -> StringList; a null
    INSIDE any list degrades the whole column to a JSON column (the
    reference's OFSTJSON behavior for .geojson,
    tests/test_geopandas_io.py:432-441). Returns a reference dtype
    string ('list(int64)'/'list(float64)'/'list(str)'/'list(bool)',
    _io.pyx:48-63) or 'json', or None when the values are not
    uniformly lists."""
    if not vals or not all(isinstance(v, list) for v in vals):
        return None
    elems = [e for v in vals for e in v]
    if any(e is None for e in elems):
        return "json"
    if elems and all(isinstance(e, bool) for e in elems):
        return "list(bool)"
    if elems and all(isinstance(e, int) and not isinstance(e, bool) for e in elems):
        return "list(int64)"
    if elems and all(isinstance(e, (int, float)) and not isinstance(e, bool) for e in elems):
        return "list(float64)"
    if all(isinstance(e, str) for e in elems):  # incl. only-empty-lists
        return "list(str)"
    return "json"


def _json_safe(v):
    """Property value -> JSON-serializable: numpy scalars unwrap,
    numpy arrays / lists (how Spark ``toPandas`` delivers ``array<T>``
    columns) become plain lists recursively, NaN/±Inf/None -> null
    (json.dumps would otherwise emit non-RFC tokens for them)."""
    if v is None or (isinstance(v, float) and not np.isfinite(v)):
        return None
    if isinstance(v, np.ndarray):
        return [_json_safe(e) for e in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_json_safe(e) for e in v]
    if isinstance(v, np.generic):
        return v.item()
    return v


def _infer_dtypes(pdf: pd.DataFrame, cols: list[str]) -> list[str]:
    """JSON carries no declarations; type each column from its non-null
    values (bool before int: Python bool is an int subclass). List
    values type per _list_dtype."""
    out = []
    for c in cols:
        vals = [v for v in pdf[c] if v is not None and not (isinstance(v, float) and np.isnan(v))]
        ld = _list_dtype(vals)
        if ld is not None:
            out.append(ld)
        elif vals and all(isinstance(v, bool) for v in vals):
            out.append("bool")
        elif vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
            out.append("int64")
        elif vals and all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
            out.append("float64")
        else:
            out.append("object")
    return out


def geojson_info(path: str, force_total_bounds: bool = False) -> dict:
    """read_info fields for GeoJSON sources. A FeatureCollection is one
    JSON document (driver-parsed by definition), so its info comes from
    the parse; GeoJSONSeq reports total_bounds None unless forced — the
    reference's capability split (fast_total_bounds False for seq,
    tests/test_core.py:698-706)."""
    import os

    seq = path.endswith((".geojsonl", ".geojsons"))
    pdf = read_geojson_pdf(path)
    if seq:
        crs = "EPSG:4326"
    else:
        with open(path) as f:
            crs = _crs_member(json.load(f))
    cols = [c for c in pdf.columns if c not in ("fid", "geometry_wkb")]
    total_bounds = None
    if not seq or force_total_bounds:
        bs = W.bounds_many([None if b is None else bytes(b) for b in pdf.geometry_wkb])
        if len(bs) and np.isfinite(bs).any():
            total_bounds = (
                float(np.nanmin(bs[:, 0])), float(np.nanmin(bs[:, 1])),
                float(np.nanmax(bs[:, 2])), float(np.nanmax(bs[:, 3])),
            )
    seen = {W.geom_type_name(b) for b in pdf.geometry_wkb if b is not None}
    if len(seen) == 1:
        gtype = next(iter(seen))
    elif seen <= {"Polygon", "MultiPolygon"} and seen:
        gtype = "MultiPolygon"
    else:
        gtype = "Unknown"
    return {
        "layer_name": os.path.splitext(os.path.basename(path))[0],
        "features": len(pdf),
        "fields": cols,
        "dtypes": _infer_dtypes(pdf, cols),
        "total_bounds": total_bounds,
        "geometry_type": gtype,
        "crs": crs,
        "encoding": "UTF-8",
    }


def _coords_to_geom(gj: dict) -> bytes | None:
    if gj is None:
        return None
    t = gj["type"]
    c = gj.get("coordinates")
    if t == "Point":
        return W.encode_point(*c[:3]) if len(c) > 2 else W.encode_point(c[0], c[1])
    if t == "LineString":
        return W.encode_linestring(np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        return W.encode_polygon([np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPoint":
        return W.encode_multipoint(np.asarray(c, dtype=np.float64)[:, :2])
    if t == "MultiLineString":
        return W.encode_multilinestring([np.asarray(l, dtype=np.float64) for l in c])
    if t == "MultiPolygon":
        return W.encode_multipolygon([[np.asarray(r, dtype=np.float64) for r in p] for p in c])
    if t == "GeometryCollection":
        return W.encode_collection([_coords_to_geom(g) for g in gj["geometries"]])
    raise ValueError(f"unsupported GeoJSON geometry type {t}")


def _geom_to_coords(g) -> dict:
    def pt(p):
        return [float(v) for v in p]

    if g.type == "Point":
        return {"type": "Point", "coordinates": pt(g.coords)}
    if g.type == "LineString":
        return {"type": "LineString", "coordinates": [pt(p) for p in g.coords]}
    if g.type == "Polygon":
        return {"type": "Polygon", "coordinates": [[pt(p) for p in r] for r in g.coords]}
    if g.type == "MultiPoint":
        return {"type": "MultiPoint", "coordinates": [pt(p.coords) for p in g.coords]}
    if g.type == "MultiLineString":
        return {"type": "MultiLineString", "coordinates": [[pt(p) for p in l.coords] for l in g.coords]}
    if g.type == "MultiPolygon":
        return {"type": "MultiPolygon", "coordinates": [[[pt(p) for p in r] for r in poly.coords] for poly in g.coords]}
    if g.type == "GeometryCollection":
        return {"type": "GeometryCollection", "geometries": [_geom_to_coords(p) for p in g.coords]}
    raise ValueError(f"cannot write geometry type {g.type}")


def _features_to_pdf(features: list[dict]) -> pd.DataFrame:
    rows, geoms = [], []
    for f in features:
        rows.append(f.get("properties") or {})
        geoms.append(_coords_to_geom(f.get("geometry")))
    pdf = pd.DataFrame(rows)
    pdf.insert(0, "fid", np.arange(len(rows), dtype=np.int64))
    pdf["geometry_wkb"] = geoms
    return pdf


def read_geojson_pdf(path: str) -> pd.DataFrame:
    """.geojson (FeatureCollection / single Feature / bare geometry) or
    .geojsonl/.geojsons (one feature per line) -> pandas frame."""
    if path.endswith((".geojsonl", ".geojsons")):
        with open(path) as f:
            feats = [json.loads(line) for line in f if line.strip()]
        return _features_to_pdf(feats)
    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") == "FeatureCollection":
        return _features_to_pdf(doc["features"])
    if doc.get("type") == "Feature":
        return _features_to_pdf([doc])
    return _features_to_pdf([{"type": "Feature", "properties": {}, "geometry": doc}])


def read_geojson(spark, path: str, **read_table_kwargs):
    """GeoJSON -> engine DataFrame, composable with read_table filters."""
    from pyogrio_spark.io.reader import read_table

    pdf = read_geojson_pdf(path)
    _SPARK_LIST = {
        "list(bool)": "array<boolean>",
        "list(int64)": "array<bigint>",
        "list(float64)": "array<double>",
        "list(str)": "array<string>",
    }
    fields = []
    json_cols = set()
    for c in pdf.columns:
        if c == "geometry_wkb":
            fields.append(f"`{c}` binary")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            fields.append(f"`{c}` bigint")
        elif pd.api.types.is_float_dtype(pdf[c]):
            fields.append(f"`{c}` double")
        elif pd.api.types.is_bool_dtype(pdf[c]):
            fields.append(f"`{c}` boolean")
        else:
            vals = [
                v for v in pdf[c]
                if v is not None and not (isinstance(v, float) and np.isnan(v))
            ]
            ld = _list_dtype(vals)
            if ld in _SPARK_LIST:
                if ld == "list(float64)":  # uniform numeric: ints ride along
                    pdf[c] = pdf[c].map(
                        lambda v: None if not isinstance(v, list) else [float(e) for e in v]
                    )
                fields.append(f"`{c}` {_SPARK_LIST[ld]}")
            elif ld == "json" or any(isinstance(v, (list, dict)) for v in vals):
                # irregular lists / objects -> JSON string column (the
                # reference's OFSTJSON degradation for .geojson files);
                # tagged with column metadata so the pandas facade can
                # parse values back to Python objects (reference
                # behavior: OFSTJSON arrays read back as lists). Every
                # non-null value is json.dumps'd — scalars included —
                # so the facade's json.loads round-trips a mixed
                # scalar/list column losslessly instead of crashing on
                # a bare string.
                pdf[c] = pdf[c].map(
                    lambda v: None
                    if v is None or (isinstance(v, float) and np.isnan(v))
                    else json.dumps(v)
                )
                fields.append(f"`{c}` string")
                json_cols.add(c)
            else:
                fields.append(f"`{c}` string")
    df = spark.createDataFrame(pdf, schema=", ".join(fields))
    if json_cols:
        from pyspark.sql import functions as F

        df = df.select(
            *[
                F.col(f"`{c}`").alias(c, metadata={"ogr_subtype": "OFSTJSON"})
                if c in json_cols
                else F.col(f"`{c}`")
                for c in df.columns
            ]
        )
    return read_table(spark, df, **read_table_kwargs)


def read_geojson_seq_distributed(spark, path: str):
    """Scale path for GeoJSONSeq: the file splits by line, each executor
    parses its share — no driver bottleneck."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import functions as F

    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)

    @pandas_udf("binary")
    def to_wkb(s: pd.Series) -> pd.Series:
        return pd.Series([_coords_to_geom(json.loads(v).get("geometry")) for v in s])

    @pandas_udf("string")
    def props(s: pd.Series) -> pd.Series:
        return pd.Series([json.dumps(json.loads(v).get("properties") or {}, sort_keys=True) for v in s])

    return lines.select(props("value").alias("properties_json"), to_wkb("value").alias("geometry_wkb"))


def write_geojson(
    pdf: pd.DataFrame, path: str, geom_col: str = "geometry_wkb", crs=None,
    append: bool = False,
) -> None:
    """Frame with WKB geometry -> .geojson FeatureCollection or
    .geojsonl sequence (by extension). Round-trips through
    read_geojson_pdf with coordinate identity (repr-exact floats).

    RFC 7946 GeoJSON is WGS84 by definition; a non-4326 ``crs`` is
    persisted as the 2008-spec 'crs' member (the same convention GDAL
    uses for non-WGS84 data), FeatureCollection layout only.

    ``append=True``: GeoJSONSeq appends lines in place (O(new data) —
    the layout exists for exactly this); a FeatureCollection is one
    JSON document, so append re-serializes existing + new features
    (the same cost GDAL pays)."""
    import os

    from pyogrio_spark.crs import crs_to_epsg

    epsg = crs_to_epsg(crs) if crs is not None else None
    if epsg is not None and epsg != 4326 and path.endswith((".geojsonl", ".geojsons")):
        raise ValueError("GeoJSONSeq has no 'crs' member; data must be EPSG:4326")
    if append and not os.path.exists(path):
        raise ValueError(f"append=True but {path} does not exist")
    feats = []
    for i in range(len(pdf)):
        row = {c: pdf[c].iloc[i] for c in pdf.columns}
        props = {
            k: _json_safe(v) for k, v in row.items() if k not in (geom_col, "fid")
        }
        g = row[geom_col]
        feats.append(
            {
                "type": "Feature",
                "properties": props,
                "geometry": None if g is None else _geom_to_coords(W.parse_wkb(bytes(g))),
            }
        )
    if path.endswith((".geojsonl", ".geojsons")):
        with open(path, "a" if append else "w") as f:
            for feat in feats:
                f.write(json.dumps(feat) + "\n")
        return
    if append:
        with open(path) as f:
            doc = json.load(f)
        if doc.get("type") != "FeatureCollection":
            raise ValueError(f"append=True needs a FeatureCollection in {path}")
        doc["features"].extend(feats)
    else:
        doc = {"type": "FeatureCollection", "features": feats}
        if epsg is not None and epsg != 4326:
            doc = {
                "type": "FeatureCollection",
                "crs": {
                    "type": "name",
                    "properties": {"name": f"urn:ogc:def:crs:EPSG::{epsg}"},
                },
                "features": feats,
            }
    with open(path, "w") as f:
        json.dump(doc, f)


def write_geojson_seq_distributed(df, out_dir: str, geom_col: str = "geometry_wkb") -> None:
    """Distributed GeoJSONSeq sink: every partition serializes its own
    rows to feature-per-line JSON (the same encoding as
    ``write_geojson``'s .geojsonl branch, repr-exact floats) and Spark's
    text writer emits one part file per partition — the write-side
    mirror of ``read_geojson_seq_distributed``, and the engine's first
    distributed non-parquet sink. Read the directory back with
    ``read_geojson_seq_distributed(spark, f"{out_dir}/part-*")``.

    Driver does no per-row work; the encode runs in an Arrow-batched
    mapInPandas stage (format sinks are Python-side by nature — the
    same boundary as every other codec here)."""
    cols = [c for c in df.columns if c not in (geom_col, "fid")]

    def enc(pdfs):
        for pdf in pdfs:
            lines = []
            for row in pdf.itertuples(index=False):
                d = row._asdict()
                g = d.get(geom_col)
                props = {k: _json_safe(v) for k, v in d.items() if k in cols}
                feat = {
                    "type": "Feature",
                    "properties": props,
                    "geometry": None if g is None else _geom_to_coords(W.parse_wkb(bytes(g))),
                }
                lines.append(json.dumps(feat))
            yield pd.DataFrame({"value": lines})

    df.mapInPandas(enc, schema="value string").write.mode("overwrite").text(out_dir)
