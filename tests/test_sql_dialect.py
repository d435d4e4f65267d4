"""OGRSQL / SQLITE dialect surface (pyogrio_spark/sql_dialect.py),
mirroring the reference's SQL tests:
tests/test_raw_io.py:271-296 (sql + bbox), and
tests/test_geopandas_io.py:1712-1860 (OGRSQL semantics: implicit
geometry, case-blind identifiers, IN / comparison / ORDER BY / LIMIT,
post-sql columns/where/skip/max) plus the canonical Spatialite
ST_Intersects neighbor-count example
(docs/source/introduction.md:291-307) rewritten to the engine's
distributed intersects join."""

import pytest

from pyogrio_spark.compat import read_dataframe
from pyogrio_spark.errors import DataLayerError

NE = "/root/reference/pyogrio/tests/fixtures/naturalearth_lowres/naturalearth_lowres.shp"


def _rd(spark, **kw):
    return read_dataframe(NE, spark=spark, **kw)


def test_ogrsql_implicit_geometry_and_alias(spark):
    """3-column select returns 4 columns: OGRSQL can't select geometry
    but GDAL returns it anyway (ref test_geopandas_io.py:1712-1719)."""
    df = _rd(
        spark,
        sql="SELECT iso_a3 AS iso_a3_renamed, name, pop_est FROM naturalearth_lowres",
        sql_dialect="OGRSQL",
    )
    assert list(df.columns) == ["iso_a3_renamed", "name", "pop_est", "geometry"]
    assert len(df) == 177


def test_ogrsql_where_star_and_case_blind(spark):
    df = _rd(
        spark,
        sql="SELECT * FROM naturalearth_lowres WHERE iso_a3 = 'CAN'",
        sql_dialect="OGRSQL",
    )
    assert len(df) == 1 and len(df.columns) == 6
    assert df.iloc[0].iso_a3 == "CAN"
    # case-blind identifiers (GDAL swq): POP_EST / ISO_A3 vs lowercase fields
    df = _rd(
        spark,
        sql="SELECT * FROM naturalearth_lowres WHERE POP_EST >= 10000000 AND POP_EST < 100000000",
        sql_dialect="OGRSQL",
    )
    assert len(df) == 75
    assert df.pop_est.min() >= 10000000 and df.pop_est.max() < 100000000
    assert (
        len(
            _rd(
                spark,
                sql="SELECT * FROM naturalearth_lowres WHERE ISO_A3 = 'INVALID'",
                sql_dialect="OGRSQL",
            )
        )
        == 0
    )


def test_ogrsql_in_order_by(spark):
    sql = "SELECT * FROM naturalearth_lowres WHERE iso_a3 IN ('CAN', 'USA', 'MEX')"
    assert _rd(spark, sql=sql, sql_dialect="OGRSQL").iso_a3.tolist() == [
        "CAN", "USA", "MEX",  # file order
    ]
    assert _rd(spark, sql=sql + " ORDER BY name", sql_dialect="OGRSQL").iso_a3.tolist() == [
        "CAN", "MEX", "USA",
    ]


def test_ogrsql_like_case_insensitive(spark):
    """GDAL OGRSQL LIKE is case-insensitive (translated to ILIKE)."""
    df = _rd(
        spark,
        sql="SELECT name FROM naturalearth_lowres WHERE name LIKE 'can%'",
        sql_dialect="OGRSQL",
    )
    assert df.name.tolist() == ["Canada"]


def test_ogrsql_post_filters(spark):
    """columns/where apply AFTER the sql, over the renamed columns
    (ref test_geopandas_io.py:1795-1808)."""
    df = _rd(
        spark,
        sql="SELECT iso_a3 AS iso_a3_renamed, name, pop_est FROM naturalearth_lowres",
        sql_dialect="OGRSQL",
        columns=["iso_a3_renamed", "name"],
        where="iso_a3_renamed IN ('CAN', 'USA', 'MEX')",
    )
    assert len(df.columns) == 3 and len(df) == 3
    assert df.iso_a3_renamed.tolist() == ["CAN", "USA", "MEX"]


def test_ogrsql_skip_max_follow_sql_order(spark):
    """skip/max ranges follow the statement's ORDER BY, not the layer
    key order (ref test_geopandas_io.py:1826-1860)."""
    df = _rd(
        spark,
        sql="SELECT * FROM naturalearth_lowres WHERE iso_a3 IN ('CAN', 'MEX', 'USA') ORDER BY name",
        sql_dialect="OGRSQL",
        skip_features=1,
        max_features=1,
    )
    assert df.iso_a3.tolist() == ["MEX"]
    assert (
        len(
            _rd(
                spark,
                sql="SELECT * FROM naturalearth_lowres LIMIT 1",
                sql_dialect="OGRSQL",
                max_features=3,
            )
        )
        == 1
    )
    assert (
        len(
            _rd(
                spark,
                sql="SELECT * FROM naturalearth_lowres LIMIT 1",
                sql_dialect="OGRSQL",
                skip_features=1,
            )
        )
        == 0
    )


def test_ogrsql_bbox_after_sql(spark):
    """ref test_raw_io.py:271-279: bbox applies after the statement."""
    df = _rd(
        spark,
        sql="SELECT * FROM naturalearth_lowres WHERE iso_a3 NOT IN ('USA', 'RUS')",
        sql_dialect="OGRSQL",
        bbox=(-180, 50, -100, 90),
    )
    assert df.iso_a3.tolist() == ["CAN"]


def test_ogrsql_aggregates(spark):
    df = _rd(
        spark,
        sql="SELECT COUNT(*) AS n, MAX(pop_est) AS mx FROM naturalearth_lowres",
        sql_dialect="OGRSQL",
    )
    assert list(df.columns) == ["n", "mx"]  # no implicit geometry on aggregates
    assert df.iloc[0].n == 177


def test_ogrsql_errors(spark):
    with pytest.raises(DataLayerError, match="SQL Expression Parsing Error"):
        _rd(spark, sql="invalid", sql_dialect="OGRSQL")
    with pytest.raises(DataLayerError, match="not recognised as an available field"):
        _rd(
            spark,
            sql="SELECT nope FROM naturalearth_lowres",
            sql_dialect="OGRSQL",
        )
    with pytest.raises(ValueError, match="'sql' parameter cannot be combined with 'layer'"):
        _rd(spark, sql="whatever", layer="invalid")


def test_sqlite_st_intersects_neighbor_counts(spark):
    """The canonical Spatialite correlated-count query rewrites to the
    engine's distributed intersects join. Counts include self (GDAL
    semantics): Brazil = 10 land neighbours + itself."""
    sql = """
        SELECT geometry, name,
               (SELECT count(*)
                  FROM naturalearth_lowres layer_sub
                 WHERE ST_Intersects(layer.geometry, layer_sub.geometry)) AS nb_neighbours
          FROM naturalearth_lowres layer
         WHERE continent = 'South America'
         ORDER BY nb_neighbours DESC
         LIMIT 5"""
    df = _rd(spark, sql=sql, sql_dialect="SQLITE")
    assert list(df.columns) == ["geometry", "name", "nb_neighbours"]
    got = dict(zip(df.name, df.nb_neighbours))
    assert got["Brazil"] == 11  # ARG BOL COL GUY PRY PER SUR URY VEN GUF + self
    assert got["Bolivia"] == 6  # ARG BRA CHL PRY PER + self
    assert df.nb_neighbours.tolist() == sorted(df.nb_neighbours, reverse=True)


def test_sqlite_unsupported_function_is_loud(spark):
    with pytest.raises(DataLayerError, match="ST_Buffer"):
        _rd(
            spark,
            sql="SELECT ST_Buffer(geometry, 5) AS geometry, name FROM naturalearth_lowres",
            sql_dialect="SQLITE",
        )


def test_native_dialect_layer_name_view(spark):
    """sql_dialect=None is Spark SQL, with the layer registered under
    its own name so reference-style FROM statements still resolve."""
    df = _rd(
        spark,
        sql="SELECT name FROM naturalearth_lowres WHERE iso_a3 = 'MEX'",
    )
    assert df.name.tolist() == ["Mexico"]


def test_ogrsql_select_list_arithmetic(spark):
    """OGRSQL field arithmetic in the select list (+ implicit geometry
    still appended for plain-expression selects)."""
    df = _rd(
        spark,
        sql="SELECT name, pop_est / 1000 AS pop_k FROM naturalearth_lowres WHERE iso_a3 = 'MEX'",
        sql_dialect="OGRSQL",
    )
    assert list(df.columns) == ["name", "pop_k", "geometry"]
    assert abs(df.iloc[0].pop_k * 1000 - 124574795) < 1000  # fixture MEX pop_est
    # unknown field inside an expression still errors loudly
    import pytest as _pytest

    from pyogrio_spark.errors import DataLayerError

    with _pytest.raises(DataLayerError, match="not recognised"):
        _rd(
            spark,
            sql="SELECT nope / 2 AS x FROM naturalearth_lowres",
            sql_dialect="OGRSQL",
        )
