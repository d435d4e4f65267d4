"""Reference-parity polish: on_invalid='fix', force_2d at read_table,
and the mixed-offset datetime decision matrix
(/root/reference/pyogrio/geopandas.py:44-135, 273-285; _io.pyx:1012-1013)."""

import struct

import numpy as np
import pandas as pd
import pytest

from pyogrio_spark.functions.datetimes import try_parse_datetime_column
from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.io.reader import read_table


def _unclosed_polygon() -> bytes:
    # 1 ring, 4 points, NOT closed
    ring = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])
    return b"\x01\x03\x00\x00\x00" + struct.pack("<II", 1, 4) + ring.astype("<f8").tobytes()


def test_on_invalid_fix_closes_rings():
    g = W.from_wkb(_unclosed_polygon(), on_invalid="fix")
    assert g.type == "Polygon"
    ring = g.coords[0]
    assert len(ring) == 5 and np.array_equal(ring[0], ring[-1])


def test_on_invalid_policies():
    bad = b"\x01\x63\x00\x00\x00"  # unsupported type code
    with pytest.raises(W.WKBError):
        W.from_wkb(bad, on_invalid="raise")
    with pytest.warns(UserWarning):
        assert W.from_wkb(bad, on_invalid="warn") is None
    assert W.from_wkb(bad, on_invalid="ignore") is None
    assert W.from_wkb(bad, on_invalid="fix") is None  # unfixable -> None, no warning
    with pytest.raises(W.WKBError):
        W.from_wkb(_unclosed_polygon(), on_invalid="raise")
    with pytest.raises(ValueError, match="on_invalid"):
        W.from_wkb(bad, on_invalid="nope")


def test_read_table_force_2d(spark):
    pz = W.encode_point(1.0, 2.0, 3.0)
    p2 = W.encode_point(5.0, 6.0)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "geometry_wkb": [pz, p2]}), schema="doc_id long, geometry_wkb binary"
    )
    out = {r.doc_id: bytes(r.geometry_wkb) for r in read_table(spark, df, force_2d=True).collect()}
    assert len(out[1]) == 21 and W.parse_wkb(out[1]).has_z is False
    assert out[2] == p2  # 2-D point passes through byte-identical
    # unclosed ring fixed during normalization
    df2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "geometry_wkb": [_unclosed_polygon()]}),
        schema="doc_id long, geometry_wkb binary",
    )
    got = read_table(spark, df2, force_2d=True, on_invalid="fix").collect()[0]
    assert W.parse_wkb(bytes(got.geometry_wkb)).coords[0].shape[0] == 5


@pytest.fixture()
def dt_df(spark):
    def mk(vals):
        return spark.createDataFrame(pd.DataFrame({"ts": vals}), schema="ts string")

    return mk


def test_datetime_all_naive_to_ntz(spark, dt_df):
    df = try_parse_datetime_column(dt_df(["2020-01-01 10:00:00.1239", "2021-02-03T04:05:06"]), "ts")
    assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    vals = [r.ts.isoformat() for r in df.collect()]
    assert vals[0] == "2020-01-01T10:00:00.123000"  # ms truncation


def test_datetime_mixed_offsets_to_utc(spark, dt_df):
    df = try_parse_datetime_column(dt_df(["2020-01-01T10:00:00+02:00", "2020-01-01T10:00:00Z"]), "ts")
    assert df.schema["ts"].dataType.simpleString() == "timestamp"
    # collect() returns session-tz (UTC) wall clocks without tzinfo
    got = sorted(r.ts.isoformat() for r in df.collect())
    assert got == ["2020-01-01T08:00:00", "2020-01-01T10:00:00"]


def test_datetime_mixed_offsets_as_strings(spark, dt_df):
    df = try_parse_datetime_column(
        dt_df(["2020-01-01T10:00:00+02:00", "2020-01-01T10:00:00Z"]), "ts", mixed_offsets_as_utc=False
    )
    assert df.schema["ts"].dataType.simpleString() == "string"
    assert sorted(r.ts for r in df.collect()) == ["2020-01-01T10:00:00+02:00", "2020-01-01T10:00:00Z"]


def test_datetime_as_string_normalizes_separator(spark, dt_df):
    df = try_parse_datetime_column(dt_df(["2020-01-01 10:00:00"]), "ts", datetime_as_string=True)
    assert df.collect()[0].ts == "2020-01-01T10:00:00"


def test_datetime_unparseable_returns_strings(spark, dt_df):
    with pytest.warns(UserWarning, match="original strings"):
        df = try_parse_datetime_column(dt_df(["2020-01-01T10:00:00", "not a date"]), "ts")
    assert df.schema["ts"].dataType.simpleString() == "string"


def test_convert_dataset_shp_to_fgb_distributed(spark, tmp_path):
    """ogr2ogr-style conversion rides the distributed halves: shapefile
    .shx-partitioned scan -> distributed FGB sink; attributes,
    geometry and CRS survive, filters compose."""
    from pyogrio_spark.io.dispatch import convert_dataset, open_table

    ne = "/root/reference/pyogrio/tests/fixtures/naturalearth_lowres/naturalearth_lowres.shp"
    dst = str(tmp_path / "ne.fgb")
    info = convert_dataset(spark, ne, dst)
    assert info["features"] == 177 and info["driver"] == "FlatGeobuf"
    assert info["crs"] == "EPSG:4326"

    src_pdf = open_table(spark, ne).toPandas()
    dst_pdf = open_table(spark, dst).toPandas()
    assert len(dst_pdf) == 177
    for c in ("name", "iso_a3", "pop_est"):
        assert sorted(map(str, src_pdf[c])) == sorted(map(str, dst_pdf[c]))
    # geometry byte-parity modulo fid ordering
    assert sorted(bytes(b) for b in src_pdf.geometry_wkb) == sorted(
        bytes(b) for b in dst_pdf.geometry_wkb
    )

    # filters compose on the scan side
    dst2 = str(tmp_path / "africa.fgb")
    info2 = convert_dataset(spark, ne, dst2, where="continent = 'Africa'")
    assert 0 < info2["features"] < 177


def test_convert_dataset_fgb_to_geojson_driver_fallback(spark, tmp_path):
    """A destination with no distributed sink (FeatureCollection) falls
    back to the driver codec with identical content."""
    from pyogrio_spark.io.dispatch import convert_dataset, open_table

    ne = "/root/reference/pyogrio/tests/fixtures/naturalearth_lowres/naturalearth_lowres.shp"
    mid = str(tmp_path / "ne.fgb")
    convert_dataset(spark, ne, mid)
    dst = str(tmp_path / "ne.geojson")
    info = convert_dataset(spark, mid, dst)
    assert info["features"] == 177 and info["driver"] == "GeoJSON"
    got = open_table(spark, dst).toPandas()
    assert len(got) == 177 and "name" in got.columns
