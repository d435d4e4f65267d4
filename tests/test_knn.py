import pandas as pd
import pytest

from pyogrio_spark.fixtures import DOCS_SPARK_SCHEMA, make_docs, make_knn_probes
from pyogrio_spark.operators.knn import knn_join
from pyogrio_spark.oracle import oracle_knn


@pytest.fixture(scope="module")
def docs_pd():
    return make_docs(1200)


@pytest.fixture(scope="module")
def probes_pd():
    return make_knn_probes(40)


def _norm(df: pd.DataFrame):
    return sorted(map(tuple, df[["probe_id", "doc_id", "rank"]].itertuples(index=False, name=None)))


def test_knn_matches_bruteforce(spark, docs_pd, probes_pd):
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    probes = spark.createDataFrame(
        probes_pd[["probe_id", "lon", "lat"]], schema="probe_id string, lon double, lat double"
    )
    got = knn_join(probes, docs, k=5).toPandas()
    want = oracle_knn(probes_pd, docs_pd, k=5)
    assert _norm(got) == _norm(want)
    # every probe got exactly k neighbors
    assert got.groupby("probe_id").size().eq(5).all()


def test_knn_k_larger_than_cell_population(spark, docs_pd, probes_pd):
    # force heavy ring expansion: k close to a sparse region's population
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    probes = spark.createDataFrame(
        probes_pd[["probe_id", "lon", "lat"]].head(8), schema="probe_id string, lon double, lat double"
    )
    got = knn_join(probes, docs, k=25).toPandas()
    want = oracle_knn(probes_pd.head(8), docs_pd, k=25)
    assert _norm(got) == _norm(want)
