"""List-type fields through the format facade, mirroring the
reference's GeoJSON list coverage (tests/test_geopandas_io.py:390-509
over the conftest.py:204-276 fixture): uniform lists read back as
typed Python lists, a list with an interior null degrades to an
OFSTJSON column that still parses to lists, binary formats refuse
list columns with direction."""

import json

import pandas as pd
import pytest

from pyogrio_spark.compat import read_dataframe, read_info, write_dataframe
from pyogrio_spark.geometry import wkb as W

# the reference fixture verbatim (conftest.py:206-270)
LIST_GEOJSON = """{
    "type": "FeatureCollection",
    "features": [
        {"type": "Feature",
         "properties": {"int": 1, "list_int": [0, 1], "list_double": [0.0, 1.0],
                        "list_string": ["string1", "string2"],
                        "list_int_with_null": [0, null],
                        "list_string_with_null": ["string1", null]},
         "geometry": {"type": "Point", "coordinates": [0, 2]}},
        {"type": "Feature",
         "properties": {"int": 2, "list_int": [2, 3], "list_double": [2.0, 3.0],
                        "list_string": ["string3", "string4", ""],
                        "list_int_with_null": [2, 3],
                        "list_string_with_null": ["string3", "string4", ""]},
         "geometry": {"type": "Point", "coordinates": [1, 2]}},
        {"type": "Feature",
         "properties": {"int": 3, "list_int": [], "list_double": [],
                        "list_string": [], "list_int_with_null": [],
                        "list_string_with_null": []},
         "geometry": {"type": "Point", "coordinates": [2, 2]}},
        {"type": "Feature",
         "properties": {"int": 4, "list_int": null, "list_double": null,
                        "list_string": null, "list_int_with_null": null,
                        "list_string_with_null": null},
         "geometry": {"type": "Point", "coordinates": [2, 2]}},
        {"type": "Feature",
         "properties": {"int": 5, "list_int": null, "list_double": null,
                        "list_string": [""], "list_int_with_null": null,
                        "list_string_with_null": [""]},
         "geometry": {"type": "Point", "coordinates": [2, 2]}}
    ]
}"""


@pytest.fixture(autouse=True)
def _use_session_spark(spark, monkeypatch):
    import pyogrio_spark.compat as C

    monkeypatch.setattr(C, "_SPARK", spark)


@pytest.fixture
def list_geojson(tmp_path):
    p = tmp_path / "test_ogr_types_list.geojson"
    p.write_text(LIST_GEOJSON)
    return str(p)


def test_read_info_list_types(list_geojson):
    """Mirrors test_read_list_types' info assertions for .geojson."""
    info = read_info(list_geojson)
    assert list(info["fields"]) == [
        "int", "list_int", "list_double", "list_string",
        "list_int_with_null", "list_string_with_null",
    ]
    assert info["ogr_types"][1] in ("OFTIntegerList", "OFTInteger64List")
    assert info["ogr_types"][2] == "OFTRealList"
    assert info["ogr_types"][3] == "OFTStringList"
    # interior null -> JSON column (GDAL .geojson behavior)
    assert info["ogr_types"][4] == "OFTString"
    assert info["ogr_subtypes"][4] == "OFSTJSON"
    assert info["ogr_types"][5] == "OFTString"
    assert info["ogr_subtypes"][5] == "OFSTJSON"
    assert list(info["dtypes"]) == [
        "int64", "list(int64)", "list(float64)", "list(str)", "object", "object",
    ]


def test_read_dataframe_list_types(list_geojson):
    """Mirrors test_read_list_types' value assertions (.geojson branch)."""
    result = read_dataframe(list_geojson)

    assert result["list_int"][0] == [0, 1]
    assert result["list_int"][1] == [2, 3]
    assert result["list_int"][2] == []
    assert result["list_int"][3] is None
    assert result["list_int"][4] is None

    assert result["list_double"][0] == [0.0, 1.0]
    assert result["list_double"][1] == [2.0, 3.0]
    assert result["list_double"][2] == []
    assert result["list_double"][3] is None

    assert result["list_string"][0] == ["string1", "string2"]
    assert result["list_string"][1] == ["string3", "string4", ""]
    assert result["list_string"][2] == []
    assert result["list_string"][3] is None
    assert result["list_string"][4] == [""]

    # JSON-degraded columns parse back to Python lists (reference:
    # "JSON columns containing JSON Arrays are also parsed to python
    # lists")
    assert result["list_int_with_null"][0][0] == 0
    assert pd.isna(result["list_int_with_null"][0][1])
    assert result["list_int_with_null"][1] == [2, 3]
    assert result["list_int_with_null"][2] == []
    assert pd.isna(result["list_int_with_null"][3])

    assert result["list_string_with_null"][0] == ["string1", None]
    assert result["list_string_with_null"][1] == ["string3", "string4", ""]
    assert result["list_string_with_null"][4] == [""]


def test_read_list_types_column_projection(list_geojson):
    """Mirrors test_read_list_types_columns: projection composes."""
    result = read_dataframe(list_geojson, columns=["list_int", "list_string"])
    assert [c for c in result.columns if c != "geometry"] == ["list_int", "list_string"]
    assert result["list_int"][1] == [2, 3]


def test_write_list_types_geojson_round_trip(tmp_path, list_geojson):
    """write_dataframe serializes list columns (incl. numpy arrays from
    Spark toPandas) back to valid GeoJSON that reads identically."""
    first = read_dataframe(list_geojson)
    out = str(tmp_path / "rt.geojson")
    write_dataframe(first, out)
    again = read_dataframe(out)
    for c in ("int", "list_int", "list_double", "list_string"):
        assert list(again[c]) == list(first[c]), c
    # degraded-JSON columns keep their values through the round trip
    assert again["list_int_with_null"][1] == [2, 3]
    assert again["list_string_with_null"][0] == ["string1", None]
    # and the written file is plain JSON with real arrays, not strings
    doc = json.loads(open(out).read())
    assert doc["features"][0]["properties"]["list_int"] == [0, 1]


def test_write_list_types_geojsonl(tmp_path, list_geojson):
    first = read_dataframe(list_geojson)
    out = str(tmp_path / "rt.geojsonl")
    write_dataframe(first, out)
    lines = [json.loads(l) for l in open(out) if l.strip()]
    assert lines[0]["properties"]["list_int"] == [0, 1]
    assert lines[1]["properties"]["list_string"] == ["string3", "string4", ""]


@pytest.mark.parametrize("ext", ["shp", "gpkg", "fgb"])
def test_binary_formats_refuse_list_columns(tmp_path, ext):
    """DBF / GPKG SQL / FGB scalar columns have no list type — the
    facade refuses with direction instead of stringifying silently."""
    pdf = pd.DataFrame(
        {
            "a": [1, 2],
            "tags": [["x", "y"], ["z"]],
            "geometry": [W.encode_point(0.0, 0.0), W.encode_point(1.0, 1.0)],
        }
    )
    with pytest.raises(ValueError, match="list-type field 'tags'"):
        write_dataframe(pdf, str(tmp_path / f"out.{ext}"))


def test_mixed_scalar_and_list_column_round_trips(tmp_path):
    """A property mixing scalar strings/numbers with lists takes the
    OFSTJSON branch; every non-null value (scalars included) is stored
    as JSON so the facade's json.loads round-trips losslessly instead
    of crashing on a bare scalar (round-5 ADVICE, geojson.py mixed
    branch)."""
    doc = {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature", "properties": {"mix": "hello"},
             "geometry": {"type": "Point", "coordinates": [0, 0]}},
            {"type": "Feature", "properties": {"mix": [1, 2]},
             "geometry": {"type": "Point", "coordinates": [1, 0]}},
            {"type": "Feature", "properties": {"mix": "123"},
             "geometry": {"type": "Point", "coordinates": [2, 0]}},
            {"type": "Feature", "properties": {"mix": 7},
             "geometry": {"type": "Point", "coordinates": [3, 0]}},
            {"type": "Feature", "properties": {"mix": None},
             "geometry": {"type": "Point", "coordinates": [4, 0]}},
        ],
    }
    p = tmp_path / "mixed.geojson"
    p.write_text(json.dumps(doc))
    result = read_dataframe(str(p))
    assert result["mix"][0] == "hello"          # scalar string survives
    assert result["mix"][1] == [1, 2]           # list parses to list
    assert result["mix"][2] == "123"            # numeric-LOOKING string stays str
    assert result["mix"][3] == 7                # real number stays numeric
    assert pd.isna(result["mix"][4])
