"""pyogrio-facade parity: the reference's public call shapes
(read_dataframe / read_info / read_bounds / list_layers /
write_dataframe, signatures per /root/reference/pyogrio/core.py and
geopandas.py) running against the reference's own naturalearth fixture
and engine-written files."""

import numpy as np
import pandas as pd
import pytest

from pyogrio_spark.compat import (
    list_layers,
    read_bounds,
    read_dataframe,
    read_info,
    write_dataframe,
)
from pyogrio_spark.geometry import wkb as W

NE = "/root/reference/pyogrio/tests/fixtures/naturalearth_lowres/naturalearth_lowres.shp"
OSM = "/root/reference/pyogrio/tests/fixtures/sample.osm.pbf"


@pytest.fixture(autouse=True)
def _use_session_spark(spark, monkeypatch):
    # reuse the test session instead of letting compat spin up its own
    import pyogrio_spark.compat as C

    monkeypatch.setattr(C, "_SPARK", spark)


def test_read_dataframe_naturalearth_golden():
    pdf = read_dataframe(NE)
    # the reference's own parity anchors for this fixture
    assert len(pdf) == 177
    assert "geometry" in pdf.columns and isinstance(pdf.geometry.iloc[0], bytes)
    assert set(["pop_est", "continent", "name", "iso_a3", "gdp_md_est"]) <= set(pdf.columns)


def test_read_dataframe_filters_compose():
    pdf = read_dataframe(NE, columns=["name", "continent"], where="continent = 'Africa'")
    assert (pdf.continent == "Africa").all() and len(pdf) > 0
    # reference semantics: columns= keeps SOURCE order (continent
    # precedes name in the shapefile schema), geometry rides along
    assert list(pdf.columns) == ["continent", "name", "geometry"]
    no_geom = read_dataframe(NE, read_geometry=False, max_features=5)
    assert "geometry" not in no_geom.columns and len(no_geom) == 5


def test_read_dataframe_fid_as_index():
    pdf = read_dataframe(NE, fids=[3, 5, 9], fid_as_index=True)
    assert list(pdf.index) == [3, 5, 9] and pdf.index.name == "fid"


def test_list_layers_ndarray():
    arr = list_layers(NE)
    assert isinstance(arr, np.ndarray) and arr.shape[1] == 2
    osm = list_layers(OSM)
    assert [r[0] for r in osm] == [
        "points", "lines", "multilinestrings", "multipolygons", "other_relations"
    ]


def test_read_info_keys_and_counts():
    info = read_info(NE)
    assert info["features"] == 177 and info["geometry_type"] in ("Polygon", "MultiPolygon")
    assert "pop_est" in list(info["fields"])
    assert info["total_bounds"] is not None and len(info["total_bounds"]) == 4
    with pytest.warns(UserWarning, match="More than one layer found"):
        osm_info = read_info(OSM)
    assert osm_info["features"] == -1  # reference: -1 unless forced


def test_read_bounds_shapes():
    fids, bounds = read_bounds(NE, max_features=2)
    assert bounds.shape == (4, 2) and fids.shape == (2,)
    with pytest.raises(ValueError, match="'max_features' must be >= 0"):
        read_bounds(NE, max_features=-1)


def test_write_dataframe_roundtrip(tmp_path):
    pdf = pd.DataFrame(
        {
            "name": ["a", "b", "c"],
            "v": np.array([1, 2, 3], dtype=np.int64),
            "geometry": [W.encode_point(float(i), float(i) * 2) for i in range(3)],
        }
    )
    for ext in (".fgb", ".geojson", ".gpkg"):
        path = str(tmp_path / f"rt{ext}")
        write_dataframe(pdf, path)
        back = read_dataframe(path)
        assert sorted(back.name) == ["a", "b", "c"]
        assert sorted(map(bytes, back.geometry)) == sorted(map(bytes, pdf.geometry))


def test_read_arrow_naturalearth():
    """Reference: read_arrow returns (meta, pyarrow.Table)
    (tests/test_arrow.py:41-60 semantics)."""
    from pyogrio_spark.compat import read_arrow

    meta, table = read_arrow(NE)
    assert table.num_rows == 177
    assert "geometry_wkb" in table.column_names
    assert meta["geometry_name"] == "geometry_wkb"
    assert meta["crs"] == "EPSG:4326"
    assert meta["fields"].tolist() == ["pop_est", "continent", "name", "iso_a3", "gdp_md_est"]
    assert meta["dtypes"].tolist() == ["int64", "object", "object", "object", "float64"]
    assert meta["ogr_types"][0] == "OFTInteger64"
    assert meta["fid_column"] == ""  # return_fids defaults False
    # WKB payload parses
    g = W.parse_wkb(table["geometry_wkb"][0].as_py())
    assert g.type in ("Polygon", "MultiPolygon")


def test_open_arrow_batch_size():
    """Reference parity: tests/test_arrow.py:211-228 — batch_size splits
    the stream into ceil(n / batch_size) batches."""
    import math

    from pyogrio_spark.compat import open_arrow

    batch_size = math.ceil(177 / 2)
    with open_arrow(NE, batch_size=batch_size, use_pyarrow=True) as (meta, reader):
        batches = list(reader)
    assert len(batches) == 2
    assert len(batches[0]) == batch_size
    assert sum(len(b) for b in batches) == 177


def test_read_arrow_skip_max_and_filters():
    from pyogrio_spark.compat import read_arrow

    _, sliced = read_arrow(NE, skip_features=10, max_features=5, return_fids=True)
    assert sliced.num_rows == 5
    assert sliced["fid"].to_pylist() == [10, 11, 12, 13, 14]
    _, filtered = read_arrow(NE, columns=["name"], where="continent = 'Africa'")
    assert filtered.column_names == ["name", "geometry_wkb"]
    assert 0 < filtered.num_rows < 177
    with pytest.raises(ValueError, match="'max_features' must be >= 0"):
        read_arrow(NE, max_features=-1)
    _, nogeom = read_arrow(NE, read_geometry=False, max_features=3)
    assert "geometry_wkb" not in nogeom.column_names


@pytest.mark.parametrize("ext", [".gpkg", ".geojsonl", ".geojson", ".shp"])
def test_write_dataframe_append_roundtrip(tmp_path, ext):
    """Reference: write_dataframe(append=True) adds features to an
    existing dataset (raw.py:668, test_geopandas_io append cases) —
    write 3, append 2, read back 5 with values and geometry intact."""
    first = pd.DataFrame(
        {
            "name": ["a", "b", "c"],
            "v": np.array([1, 2, 3], dtype=np.int64),
            "geometry": [W.encode_point(float(i), 0.0) for i in range(3)],
        }
    )
    more = pd.DataFrame(
        {
            "name": ["d", "e"],
            "v": np.array([4, 5], dtype=np.int64),
            "geometry": [W.encode_point(float(i), 1.0) for i in (3, 4)],
        }
    )
    path = str(tmp_path / f"ap{ext}")
    write_dataframe(first, path)
    write_dataframe(more, path, append=True)
    back = read_dataframe(path)
    assert sorted(back.name) == ["a", "b", "c", "d", "e"]
    assert sorted(back.v) == [1, 2, 3, 4, 5]
    assert sorted(map(bytes, back.geometry)) == sorted(
        map(bytes, list(first.geometry) + list(more.geometry))
    )
    # info stays consistent (count + widened bounds where headers track them)
    info = read_info(path)
    assert info["features"] == 5
    if ext in (".gpkg", ".shp"):
        assert np.allclose(info["total_bounds"], (0.0, 0.0, 4.0, 1.0))


def test_append_errors():
    pdf = pd.DataFrame({"geometry": [W.encode_point(0.0, 0.0)]})
    with pytest.raises(ValueError, match="does not exist"):
        write_dataframe(pdf, "/tmp/definitely_missing_x9.gpkg", append=True)
    with pytest.raises(ValueError, match="not supported for FlatGeobuf"):
        write_dataframe(pdf, "/tmp/whatever.fgb", append=True)


def test_append_column_mismatch_raises(tmp_path):
    a = pd.DataFrame({"x": [1], "geometry": [W.encode_point(0.0, 0.0)]})
    b = pd.DataFrame({"y": [2], "geometry": [W.encode_point(1.0, 1.0)]})
    p = str(tmp_path / "mm.gpkg")
    write_dataframe(a, p)
    with pytest.raises(ValueError, match="column mismatch"):
        write_dataframe(b, p, append=True)


def test_raw_read_naturalearth():
    """Reference raw API parity: read() returns (meta, fids, geometry,
    field_data) — tests/test_raw_io.py:59-91 semantics."""
    from pyogrio_spark.compat import read

    meta, fids, geometry, fields = read(NE)
    assert meta["fields"].tolist() == ["pop_est", "continent", "name", "iso_a3", "gdp_md_est"]
    assert meta["crs"] == "EPSG:4326" and meta["geometry_type"] in ("Polygon", "MultiPolygon")
    assert fids is None  # return_fids defaults False
    assert geometry.shape == (177,) and isinstance(geometry[0], bytes)
    assert len(fields) == 5 and all(len(a) == 177 for a in fields)
    assert fields[0].dtype == np.int64  # pop_est

    meta2, fids2, geom2, fields2 = read(NE, return_fids=True, max_features=3, skip_features=2)
    assert fids2.tolist() == [2, 3, 4]
    assert geom2.shape == (3,)

    _, _, nogeom, f3 = read(NE, read_geometry=False, columns=["name"])
    assert nogeom is None and len(f3) == 1 and len(f3[0]) == 177


def test_raw_write_read_roundtrip(tmp_path):
    """Raw write() -> raw read() inverse round trip (reference raw.py
    write/read pair) across the writable drivers."""
    from pyogrio_spark.compat import read, write

    geoms = [W.encode_point(float(i), float(-i)) for i in range(4)]
    names = np.array(["a", "b", "c", "d"], dtype=object)
    vals = np.array([10, 20, 30, 40], dtype=np.int64)
    for ext in (".fgb", ".gpkg", ".geojson", ".shp"):
        p = str(tmp_path / f"raw{ext}")
        write(p, geoms, [names, vals], ["name", "v"], crs="EPSG:3857")
        meta, fids, geometry, data = read(p)
        assert meta["crs"] == "EPSG:3857", ext
        assert [bytes(g) for g in geometry] == geoms, ext
        assert list(data[list(meta["fields"]).index("v")]) == [10, 20, 30, 40], ext


def test_raw_read_osm_layer():
    """raw read() works on sources without header metadata (OSM):
    meta derives from the result."""
    from pyogrio_spark.compat import read

    meta, fids, geometry, fields = read(OSM, layer="points")
    assert geometry.shape == (8,)
    assert meta["geometry_type"] == "Point"
    assert "highway" in list(meta["fields"])


def test_write_arrow_shp_roundtrip(tmp_path):
    """Reference tests/test_arrow.py:420-435: read_arrow -> write_arrow
    round trip through a shapefile, including sidecar files."""
    from pyogrio_spark.compat import read_arrow, write_arrow

    meta, table = read_arrow(NE)
    out = tmp_path / "test.shp"
    write_arrow(
        table,
        out,
        crs=meta["crs"],
        encoding=meta["encoding"],
        geometry_type=meta["geometry_type"],
        geometry_name=meta["geometry_name"] or "wkb_geometry",
    )
    assert out.exists()
    for ext in (".dbf", ".prj"):
        assert out.with_suffix(ext).exists()
    back = read_dataframe(str(out))
    assert len(back) == 177
    assert set(back["name"]) == set(table.column("name").to_pylist())


def test_write_arrow_gpkg_and_reader_stream(tmp_path):
    """Reference tests/test_arrow.py:440-454: write a RecordBatchReader
    (not just a Table) via the PyCapsule stream protocol to GPKG."""
    import pyarrow as pa

    from pyogrio_spark.compat import read_arrow, write_arrow

    meta, table = read_arrow(NE, max_features=20)
    reader = pa.RecordBatchReader.from_batches(table.schema, table.to_batches())
    out = tmp_path / "test.gpkg"
    write_arrow(
        reader,
        out,
        driver="GPKG",
        crs=meta["crs"],
        geometry_type="MultiPolygon",
        geometry_name=meta["geometry_name"] or "wkb_geometry",
    )
    assert out.exists()
    assert len(read_dataframe(str(out))) == 20


def test_write_arrow_error_semantics(tmp_path):
    """Reference tests/test_arrow.py:830-900: non-arrow data,
    promote_to_multi, and missing geometry_type all raise."""
    from pyogrio_spark.compat import read_arrow, write_arrow

    with pytest.raises(ValueError, match="not recognized as Arrow data"):
        write_arrow({"a": [1]}, tmp_path / "x.shp")

    _, table = read_arrow(NE, max_features=2)
    with pytest.raises(ValueError, match="promote_to_multi"):
        write_arrow(
            table, tmp_path / "x.gpkg", driver="GPKG",
            geometry_type="MultiPolygon", geometry_name="geometry_wkb",
            promote_to_multi=True,
        )
    with pytest.raises(ValueError, match="'geometry_type' keyword is required"):
        write_arrow(table, tmp_path / "x.gpkg", driver="GPKG", geometry_name="geometry_wkb")


def test_write_arrow_infers_engine_geometry_name(tmp_path):
    """Un-annotated streams fall back to the engine's interchange
    geometry names, so read_arrow -> write_arrow needs no explicit
    geometry_name."""
    from pyogrio_spark.compat import read_arrow, write_arrow

    meta, table = read_arrow(NE, max_features=5)
    out = tmp_path / "inferred.geojson"
    write_arrow(table, out, crs=meta["crs"])
    assert len(read_dataframe(str(out))) == 5


def test_missing_dataset_raises_datasource_error(tmp_path):
    """Reference error-surface parity (errors.py + test_core.py:750):
    opening a nonexistent path raises pyogrio's DataSourceError with
    GDAL's message, from every read entry point."""
    from pyogrio_spark.errors import DataLayerError, DataSourceError

    missing = str(tmp_path / "nope.shp")
    with pytest.raises(DataSourceError, match="No such file or directory"):
        read_info(missing)
    with pytest.raises(DataSourceError, match="No such file or directory"):
        read_dataframe(missing)
    with pytest.raises(DataSourceError, match="No such file or directory"):
        list_layers(str(tmp_path / "gone.gpkg"))
    # hierarchy parity with the reference errors module
    from pyogrio_spark import errors as E

    assert issubclass(E.CRSError, DataLayerError)
    assert issubclass(E.FieldError, DataLayerError)
    assert issubclass(DataSourceError, RuntimeError)
    # existence is checked BEFORE format detection (round-5 ADVICE):
    # an unrecognized extension still gets the reference's message
    with pytest.raises(DataSourceError, match="No such file or directory"):
        read_info(str(tmp_path / "gone.xyzzy"))


def test_read_arrow_geoarrow_metadata(tmp_path):
    """Reference tests/test_arrow.py:290-296 (GDAL >= 3.8): the geometry
    field of the Arrow output carries the geoarrow.wkb extension name
    and PROJJSON crs metadata — and the annotated table round-trips
    through write_arrow (which resolves the geometry column from that
    same extension metadata) without naming it explicitly."""
    import json

    from pyogrio_spark.compat import read_arrow, read_dataframe, write_arrow

    meta, table = read_arrow(NE)
    field = table.schema.field("geometry_wkb")
    assert field.metadata[b"ARROW:extension:name"] == b"geoarrow.wkb"
    parsed = json.loads(field.metadata[b"ARROW:extension:metadata"])
    assert parsed["crs"]["id"]["authority"] == "EPSG"
    assert parsed["crs"]["id"]["code"] == 4326
    # streaming variant exposes the same annotated schema
    from pyogrio_spark.compat import open_arrow

    with open_arrow(NE) as (_, reader):
        f2 = reader.schema.field("geometry_wkb")
        assert f2.metadata[b"ARROW:extension:name"] == b"geoarrow.wkb"
        reader.read_all()
    # round trip: write_arrow picks the geometry column from the
    # extension metadata (no geometry_name passed)
    out = tmp_path / "geoarrow_rt.shp"
    write_arrow(table, out, crs=meta["crs"], geometry_type=meta["geometry_type"])
    back = read_dataframe(str(out))
    assert len(back) == 177 and "geometry" in back.columns
