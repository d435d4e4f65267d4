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


def test_21_byte_non_point_does_not_bypass_policy(spark):
    """Regression (round-2 ADVICE low): the zero-copy fast path used to
    trigger on ANY uniformly-21-byte batch; a big-endian point or 21
    bytes of garbage silently bypassed normalization and on_invalid.
    The header gate must route such batches to the per-row path."""
    import struct

    import pytest

    # big-endian 2-D point: valid WKB, but not the little-endian
    # normalized form — must be rewritten, not passed through
    be_point = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
    assert len(be_point) == 21
    geoms = [be_point] + [W.encode_point(float(i), 0.0) for i in range(9)]
    df = _docs_with_spans(spark, geoms)
    out = normalize_geometry_arrow(df).collect()
    got = bytes([r for r in out if r.doc_id == 0][0].geometry_wkb)
    assert got[:5] == W._POINT_LE_2D  # normalized to little-endian
    assert struct.unpack("<dd", got[5:]) == (3.0, 4.0)

    # 21 bytes of garbage with on_invalid='raise' must raise, not pass
    bad = b"\x07" * 21
    df2 = _docs_with_spans(spark, [bad] + geoms[1:])
    with pytest.raises(Exception):
        normalize_geometry_arrow(df2, on_invalid="raise").collect()
    # and with on_invalid='ignore' it nulls out instead
    out2 = normalize_geometry_arrow(df2, on_invalid="ignore").collect()
    assert [r for r in out2 if r.doc_id == 0][0].geometry_wkb is None


def test_curves_normalize_through_arrow_stage(spark):
    arc = W.encode_circularstrings([-1.0], [0.0], [0.0], [1.0], [1.0], [0.0])[0]
    geoms = [arc, W.encode_point(0.0, 0.0)]
    df = _docs_with_spans(spark, geoms)
    out = normalize_geometry_arrow(df)
    g0 = W.parse_wkb(bytes(out.filter("doc_id = 0").collect()[0].geometry_wkb))
    assert g0.type == "LineString" and len(g0.coords) == 46
