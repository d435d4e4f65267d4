"""mapInArrow passthrough stage: spans survive byte-identical, uniform
point batches pass through zero-copy, curve/Z rows get normalized."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pyogrio_spark.functions.arrow_stages import normalize_geometry_arrow
from pyogrio_spark.functions.geo import span_digest
from pyogrio_spark.geometry import wkb as W


def _docs_with_spans(spark, geoms):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(geoms), dtype=np.int64),
            "geometry_wkb": geoms,
            "spans": [
                [
                    {"kind": "text", "text": f"t{i}", "media_ref": None, "offset": 0},
                    {"kind": "media", "text": None, "media_ref": f"m://{i}", "offset": 1},
                ]
                for i in range(len(geoms))
            ],
        }
    )
    schema = (
        "doc_id long, geometry_wkb binary, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    return spark.createDataFrame(pdf, schema=schema)


def test_spans_survive_arrow_stage_byte_identical(spark):
    geoms = [W.encode_point(float(i), float(i)) for i in range(50)]
    geoms[7] = W.encode_point(1.0, 2.0, 3.0)  # one Z point forces the rewrite path
    df = _docs_with_spans(spark, geoms)
    before = {r.doc_id: r.d for r in df.select("doc_id", span_digest().alias("d")).collect()}
    out = normalize_geometry_arrow(df, force_2d=True)
    after = {r.doc_id: r.d for r in out.select("doc_id", span_digest().alias("d")).collect()}
    assert before == after  # per-row span invariant (kind, text, media_ref, order)
    z = [bytes(r.geometry_wkb) for r in out.filter("doc_id = 7").collect()][0]
    assert len(z) == 21 and not W.parse_wkb(z).has_z


def test_uniform_point_batch_passes_through_unchanged(spark):
    geoms = [W.encode_point(float(i), -float(i)) for i in range(40)]
    df = _docs_with_spans(spark, geoms)
    out = normalize_geometry_arrow(df, force_2d=True)
    got = {r.doc_id: bytes(r.geometry_wkb) for r in out.collect()}
    assert got == {i: geoms[i] for i in range(40)}
    assert "MapInArrow" in out._jdf.queryExecution().executedPlan().toString()


def test_curves_normalize_through_arrow_stage(spark):
    arc = W.encode_circularstrings([-1.0], [0.0], [0.0], [1.0], [1.0], [0.0])[0]
    geoms = [arc, W.encode_point(0.0, 0.0)]
    df = _docs_with_spans(spark, geoms)
    out = normalize_geometry_arrow(df)
    g0 = W.parse_wkb(bytes(out.filter("doc_id = 0").collect()[0].geometry_wkb))
    assert g0.type == "LineString" and len(g0.coords) == 46
