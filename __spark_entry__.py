"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship point-in-polygon spatial join end-to-end on
sf0.001; ``queries``/``oracle_sql`` expose the full operator suite with
independent DuckDB oracles (see pyogrio_spark/queries.py for how the
deterministic geometry is synthesized identically in both engines).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyogrio_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PIP spatial join of documents (deterministic synthetic
    point geometry) against 200 zone polygons at sf0.001."""
    return QUERIES["geo_pip_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
