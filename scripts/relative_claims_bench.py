"""Reproduce the reference's *published* relative performance claims on
this engine (BASELINE.md: the reference commits only relative numbers).

Claim 1 — bounds-only scan vs full feature read: ~2-3x faster
  (/root/reference/pyogrio/core.py:184-185). Engine analogue: the
  5-column envelope scan vs full-row materialization of the same
  on-disk parquet table (spans array + text + geometry are the heavy
  columns the bounds scan never touches — Catalyst column pruning is
  the engine's OGR_L_SetIgnoredFields).

Claim 2 — vectorized bulk read vs row-per-row access: >5-100x
  (/root/reference/README.md:26-27, pyogrio vs Fiona). Faithful
  analogue: the engine's batch WKB envelope kernel (bounds_many,
  numpy-vectorized — what runs inside the Arrow UDF) vs the same
  result computed with a per-feature parse loop (the Fiona model),
  both single-threaded in-process, same buffers. This isolates the
  kernel exactly as the reference's pytest-benchmark does; the
  end-to-end Spark stage is reported too, where the single-JVM
  sandbox's Python-worker ceiling (BENCH/BASELINE.md §3) compresses
  the gap.

Both Spark jobs force materialization through the noop sink (count()
would let Catalyst prune the very columns under test).

Usage: python scripts/relative_claims_bench.py [sf_dir] [n_rows]
Prints one JSON line.
"""

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor python workers need the package too (driver env is inherited)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import numpy as np
from pyspark.sql import functions as F

from pyogrio_spark import get_spark
from pyogrio_spark.functions.geo import bounds_columns, point_wkb_column
from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.io.reader import read_bounds


def materialize(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def kernel_bench(n: int = 2_000_000) -> dict:
    """Single-threaded, in-process: batch kernel vs per-feature loop on
    identical WKB buffers (mirrors the reference's pytest-benchmark)."""
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-85, 85, n)
    wkbs = W.encode_points(lon, lat)

    t0 = time.perf_counter()
    vec = W.bounds_many(wkbs)
    t_vec = time.perf_counter() - t0

    m = max(n // 20, 1)  # the row loop is slow; sample and scale
    t0 = time.perf_counter()
    row = np.empty((m, 4))
    for i in range(m):
        row[i] = W.bounds(bytes(wkbs[i]))
    t_row = (time.perf_counter() - t0) * (n / m)

    assert np.allclose(vec[:m], row)
    return {
        "kernel_rows": n,
        "kernel_vectorized_s": round(t_vec, 2),
        "kernel_row_per_row_s": round(t_row, 2),
        "kernel_speedup": round(t_row / t_vec, 1),
    }


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("relative-claims", master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    tmp = tempfile.mkdtemp(prefix="relclaims_")
    table = os.path.join(tmp, "wide")
    try:
        # a wide on-disk geo table: real docs attributes (spans, text) +
        # engine-encoded WKB geometry + persisted envelope columns
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        mult = max(1, n_rows // max(docs.count(), 1))
        wide = (
            spark.range(mult)
            .crossJoin(docs)
            .withColumn("doc_id", F.col("doc_id") * mult + F.col("id"))
            .drop("id")
            .withColumn("lon", F.expr("((doc_id * 2654435761) % 36000000) / 1e5 - 180"))
            .withColumn("lat", F.expr("((doc_id * 40503) % 17000000) / 1e5 - 85"))
            .withColumn("geometry_wkb", point_wkb_column("lon", "lat"))
            .drop("lon", "lat")
            .repartition(int(cpus) * 2)
        )
        bounds_columns(wide).write.mode("overwrite").parquet(table)

        stored = spark.read.parquet(table)
        n = stored.count()

        # --- claim 1: bounds-only scan vs full feature read (from disk) ---
        t_full = materialize(stored)
        t_bounds = materialize(read_bounds(spark, stored))

        # --- claim 2 (end-to-end Spark stage, sandbox-capped) -------------
        src = stored.select("doc_id", "geometry_wkb").cache()
        src.count()
        t_vec_stage = materialize(bounds_columns(src).select("xmin", "ymin", "xmax", "ymax"))

        out = {
            "rows": n,
            "full_read_s": round(t_full, 2),
            "bounds_only_s": round(t_bounds, 2),
            "bounds_vs_full_speedup": round(t_full / t_bounds, 2),
            "stage_vectorized_decode_s": round(t_vec_stage, 2),
        }
        out.update(kernel_bench())
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
