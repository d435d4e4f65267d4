"""GDAL-runtime facade (pyogrio_spark/runtime.py): config options,
data path, and the /vsimem/ VSI filesystem — mirroring the reference's
tests/test_core.py:724-830 behavior table."""

import pytest

from pyogrio_spark import (
    __gdal_geos_version__,
    __gdal_version__,
    __gdal_version_string__,
    get_gdal_config_option,
    get_gdal_data_path,
    read_dataframe,
    set_gdal_config_options,
    vsi_curl_clear_cache,
    vsi_listtree,
    vsi_rmtree,
    vsi_unlink,
    write_dataframe,
)


@pytest.mark.parametrize(
    "name,value,expected",
    [
        # reference tests/test_core.py:724-737
        ("CPL_DEBUG", "ON", True),
        ("CPL_DEBUG", True, True),
        ("CPL_DEBUG", "OFF", False),
        ("CPL_DEBUG", False, False),
        ("GDAL_NUM_THREADS", "4", 4),
        ("CPL_TMPDIR", "/tmp/x", "/tmp/x"),
    ],
)
def test_set_config_options(name, value, expected):
    set_gdal_config_options({name: value})
    assert get_gdal_config_option(name) == expected
    set_gdal_config_options({name: None})
    assert get_gdal_config_option(name) is None


def test_reset_config_options():
    set_gdal_config_options({"foo": "bar"})
    assert get_gdal_config_option("foo") == "bar"
    set_gdal_config_options({"foo": None})
    assert get_gdal_config_option("foo") is None


def test_unset_option_is_none():
    assert get_gdal_config_option("never_set_option") is None


def test_gdal_data_path_and_versions():
    assert get_gdal_data_path() is None
    assert __gdal_version__ == (0, 0, 0)
    assert not __gdal_version__ >= (3, 6)  # feature gates take no-GDAL branch
    assert "no GDAL runtime" in __gdal_version_string__
    assert __gdal_geos_version__ is None


@pytest.fixture()
def vsimem_fixture():
    """Two GeoJSON datasets in /vsimem/, one nested — the reference's
    test_vsimem_listtree_rmtree_unlink setup shape (test_core.py:765-776)."""
    import pandas as pd

    from pyogrio_spark.geometry import wkb as W

    pdf = pd.DataFrame(
        {
            "a": [1, 2],
            "geometry": [W.encode_point(0.0, 0.0), W.encode_point(1.0, 1.0)],
        }
    )
    write_dataframe(pdf, "/vsimem/pyogrio_test_ne.geojson")
    write_dataframe(pdf, "/vsimem/pyogrio_dir_test/ne.geojson")
    yield
    for p in vsi_listtree("/vsimem/"):
        try:
            if p.endswith("/"):
                vsi_rmtree(p)
            else:
                vsi_unlink(p)
        except (FileNotFoundError, OSError):
            pass


def test_vsimem_listtree_rmtree_unlink(vsimem_fixture):
    files = vsi_listtree("/vsimem/")
    assert "/vsimem/pyogrio_test_ne.geojson" in files
    assert "/vsimem/pyogrio_dir_test/ne.geojson" in files

    # pattern filter (fnmatch; * crosses directory separators like GDAL)
    files = vsi_listtree("/vsimem/", pattern="pyogrio_dir_test*.geojson")
    assert "/vsimem/pyogrio_test_ne.geojson" not in files
    assert "/vsimem/pyogrio_dir_test/ne.geojson" in files

    files = vsi_listtree("/vsimem/", pattern="pyogrio_test*.geojson")
    assert "/vsimem/pyogrio_test_ne.geojson" in files
    assert "/vsimem/pyogrio_dir_test/ne.geojson" not in files

    # reads go through the same namespace
    assert len(read_dataframe("/vsimem/pyogrio_test_ne.geojson")) == 2

    vsi_rmtree("/vsimem/pyogrio_dir_test")
    files = vsi_listtree("/vsimem/")
    assert "/vsimem/pyogrio_test_ne.geojson" in files
    assert "/vsimem/pyogrio_dir_test/ne.geojson" not in files

    vsi_unlink("/vsimem/pyogrio_test_ne.geojson")
    assert "/vsimem/pyogrio_test_ne.geojson" not in vsi_listtree("/vsimem/")


def test_vsimem_rmtree_error(vsimem_fixture):
    # reference test_core.py:801-819
    with pytest.raises(NotADirectoryError, match="Path is not a directory"):
        vsi_rmtree("/vsimem/pyogrio_test_ne.geojson")
    with pytest.raises(FileNotFoundError, match="Path does not exist"):
        vsi_rmtree("/vsimem/non-existent")
    with pytest.raises(OSError, match="path to in-memory file or directory"):
        vsi_rmtree("/vsimem")
    with pytest.raises(OSError, match="path to in-memory file or directory"):
        vsi_rmtree("/vsimem/")
    assert "/vsimem/pyogrio_test_ne.geojson" in vsi_listtree("/vsimem")


def test_vsimem_unlink_error(vsimem_fixture):
    # reference test_core.py:822-826
    with pytest.raises(IsADirectoryError, match="Path is a directory"):
        vsi_unlink("/vsimem/pyogrio_dir_test")
    with pytest.raises(FileNotFoundError, match="Path does not exist"):
        vsi_unlink("/vsimem/non-existent.gpkg")


def test_vsi_listtree_missing():
    with pytest.raises(FileNotFoundError, match="Path does not exist"):
        vsi_listtree("/vsimem/never-made-dir")


def test_vsi_curl_clear_cache(tmp_path, spark):
    """Clearing drops the extracted-archive cache so the next open
    re-extracts (reference test_core.py:829+ just checks no-raise; the
    engine's cache is observable, so assert the stronger property)."""
    import zipfile

    import pandas as pd

    from pyogrio_spark.geometry import wkb as W
    from pyogrio_spark.io import dispatch

    pdf = pd.DataFrame(
        {"a": [1], "geometry": [W.encode_point(0.0, 0.0)]}
    )
    gj = tmp_path / "t.geojson"
    write_dataframe(pdf, str(gj))
    z = tmp_path / "t.zip"
    with zipfile.ZipFile(z, "w") as zf:
        zf.write(gj, "t.geojson")

    assert dispatch.open_table(spark, str(z)).count() == 1
    assert any(k[0] == str(z) for k in dispatch._ZIP_CACHE)
    vsi_curl_clear_cache(prefix=str(tmp_path))
    assert not any(k[0] == str(z) for k in dispatch._ZIP_CACHE)
    # no-prefix form clears everything and never raises (reference parity)
    vsi_curl_clear_cache()
    assert dispatch.open_table(spark, str(z)).count() == 1
