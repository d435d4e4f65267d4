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

import numpy as np
import pandas as pd

from pyogrio_spark.geometry import wkb as W


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
    fields = []
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
            fields.append(f"`{c}` string")
    df = spark.createDataFrame(pdf, schema=", ".join(fields))
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


def write_geojson(pdf: pd.DataFrame, path: str, geom_col: str = "geometry_wkb") -> None:
    """Frame with WKB geometry -> .geojson FeatureCollection or
    .geojsonl sequence (by extension). Round-trips through
    read_geojson_pdf with coordinate identity (repr-exact floats)."""
    feats = []
    for _, row in pdf.iterrows():
        props = {
            k: (None if (v is None or (isinstance(v, float) and np.isnan(v))) else (v.item() if isinstance(v, np.generic) else v))
            for k, v in row.items()
            if k not in (geom_col, "fid")
        }
        g = row[geom_col]
        feats.append(
            {
                "type": "Feature",
                "properties": props,
                "geometry": None if g is None else _geom_to_coords(W.parse_wkb(bytes(g))),
            }
        )
    with open(path, "w") as f:
        if path.endswith((".geojsonl", ".geojsons")):
            for feat in feats:
                f.write(json.dumps(feat) + "\n")
        else:
            json.dump({"type": "FeatureCollection", "features": feats}, f)


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
                props = {
                    k: (
                        None
                        if (v is None or (isinstance(v, float) and np.isnan(v)))
                        else (v.item() if isinstance(v, np.generic) else v)
                    )
                    for k, v in d.items()
                    if k in cols
                }
                feat = {
                    "type": "Feature",
                    "properties": props,
                    "geometry": None if g is None else _geom_to_coords(W.parse_wkb(bytes(g))),
                }
                lines.append(json.dumps(feat))
            yield pd.DataFrame({"value": lines})

    df.mapInPandas(enc, schema="value string").write.mode("overwrite").text(out_dir)
