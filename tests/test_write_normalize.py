import numpy as np
import pandas as pd
import pytest

from pyogrio_spark.fixtures import make_datetimes, make_geom_zoo, make_list_fields, make_nulls_matrix
from pyogrio_spark.functions.datetimes import parse_iso_datetime_utc, truncate_to_ms
from pyogrio_spark.functions.geometry_write import infer_layer_geometry_type, promote_to_multi
from pyogrio_spark.geometry import wkb as W


SQ = np.array([(0.0, 0.0), (1, 0), (1, 1), (0, 1), (0, 0)])


def test_infer_and_promote_mixed_polygons(spark):
    rows = [
        (1, W.encode_polygon([SQ])),
        (2, W.encode_multipolygon([[SQ], [SQ + 5]])),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id int, geometry_wkb binary")
    gtype, promote = infer_layer_geometry_type(df)
    assert gtype == "MultiPolygon" and promote
    out = {r["id"]: r["geometry_wkb"] for r in promote_to_multi(df).collect()}
    g1 = W.parse_wkb(bytes(out[1]))
    assert g1.type == "MultiPolygon" and len(g1.coords) == 1
    np.testing.assert_array_equal(g1.coords[0].coords[0], SQ)  # coordinates preserved
    assert W.parse_wkb(bytes(out[2])).type == "MultiPolygon"  # already multi: untouched
    assert out[3] is None


def test_infer_single_and_unknown(spark):
    pts = [(1, W.encode_point(1, 2)), (2, W.encode_point(3, 4))]
    df = spark.createDataFrame(pts, "id int, geometry_wkb binary")
    assert infer_layer_geometry_type(df) == ("Point", False)
    mixed = [(1, W.encode_point(1, 2)), (2, W.encode_polygon([SQ]))]
    df2 = spark.createDataFrame(mixed, "id int, geometry_wkb binary")
    assert infer_layer_geometry_type(df2) == ("Unknown", False)


def test_geom_zoo_types_roundtrip(spark):
    zoo = make_geom_zoo()
    for _, row in zoo.iterrows():
        if row.geometry_wkb is None:
            continue
        assert W.geom_type_name(row.geometry_wkb) == row.expected_type, row.case


def test_datetime_parse_utc_and_ms(spark):
    dt = make_datetimes()
    df = spark.createDataFrame(dt[["dt_tz_iso", "dt_long_ago"]])
    out = df.select(parse_iso_datetime_utc("dt_tz_iso").alias("utc")).collect()
    # -05:00 offset normalizes to UTC (reference mixed_offsets_as_utc default)
    assert str(out[0]["utc"]) == "2020-01-01 14:00:00.123000"
    sub_ms = spark.createDataFrame([("2020-01-01 00:00:00.123456",)], "s string").select(
        truncate_to_ms("s").alias("t")
    )
    assert str(sub_ms.head()["t"]).endswith("00.123000")


def test_nulls_and_list_fixtures_load(spark):
    nulls = make_nulls_matrix()
    df = spark.createDataFrame(
        nulls,
        schema=(
            "col_bool boolean, col_int8 short, col_int16 short, col_int32 int, col_int64 long, "
            "col_uint8 short, col_uint16 int, col_uint32 long, col_uint64 long, "
            "col_float32 float, col_float64 double, geometry_wkb binary"
        ),
    )
    back = df.toPandas()
    assert back.iloc[3].isna().drop("geometry_wkb").all()  # the all-null row
    assert back.col_int64[2] == 2**63 - 1
    lists = spark.createDataFrame(
        make_list_fields(),
        schema=(
            "int int, list_int array<int>, list_double array<double>, list_string array<string>, "
            "list_int_with_null array<int>, list_string_with_null array<string>, geometry_wkb binary"
        ),
    )
    lp = lists.toPandas()
    assert lp.list_int[3] == [] or len(lp.list_int[3]) == 0
    assert lp.list_int[4] is None
    assert list(lp.list_string[1]) == ["", "d"]
    assert lp.list_int_with_null[0][1] is None or np.isnan(lp.list_int_with_null[0][1])
