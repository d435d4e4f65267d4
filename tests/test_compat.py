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
