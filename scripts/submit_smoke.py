"""spark-submit entry: proves the engine ships via --py-files.

    python scripts/make_pyfiles_zip.py
    spark-submit --master 'local[8]' --py-files dist/pyogrio_spark.zip \
        scripts/submit_smoke.py /root/testdata/sf0.001

Imports pyogrio_spark ONLY from the shipped zip (no repo on sys.path)
and runs the flagship PIP join end-to-end.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("pyogrio_spark_submit_smoke").getOrCreate()

    from pyspark.sql import functions as F

    from pyogrio_spark.functions.geo import cell_id_column
    from pyogrio_spark.operators.spatial_join import point_in_polygon_join, zones_cell_cover
    from pyogrio_spark.queries import GEO_RES, LAT_EXPR, LON_EXPR, _zones_pd

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    docs = docs.withColumn("xmin", F.expr(LON_EXPR)).withColumn("ymin", F.expr(LAT_EXPR))
    docs = docs.withColumn("cell_id", cell_id_column("xmin", "ymin", GEO_RES))
    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    n = point_in_polygon_join(docs, cover, zone_key="zone_id", keep_doc_cols=["doc_id"]).count()
    print(json.dumps({"submit_smoke_pairs": n}))
    spark.stop()


if __name__ == "__main__":
    main()
