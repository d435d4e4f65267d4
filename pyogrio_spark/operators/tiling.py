"""Tile assignment + adaptive (balanced) tiling.

The reference's suggested scale-out pattern is manual range-splitting
("read defined ranges ... in multiple processes",
/root/reference/docs/source/introduction.md:175-180) aided by
``read_bounds`` (/root/reference/pyogrio/core.py:182-187). Here tiles
are grid cells: assignment is the cell formula (codegen, exact,
deterministic), and *adaptive* tiling splits hot cells into children
until each tile is under a row budget — the partitioner that keeps a
10^12-doc shuffle free of straggler partitions. The split decision is
one cheap groupBy(count) sketch per level; the resulting cell->tile map
is deterministic, so resume after failure reproduces identical tiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyogrio_spark.index.grid import cell_expr_sql, children

DEFAULT_RES = 7


def assign_tiles(df: DataFrame, res: int = DEFAULT_RES, lon_col: str = "xmin", lat_col: str = "ymin") -> DataFrame:
    """tile_id = grid cell at ``res`` (pure expression, no UDF)."""
    return df.withColumn("tile_id", F.expr(cell_expr_sql(lon_col, lat_col, res)))


def adaptive_tiles(
    df: DataFrame,
    base_res: int = 4,
    max_res: int = 12,
    target_rows: int = 100_000,
    lon_col: str = "xmin",
    lat_col: str = "ymin",
) -> pd.DataFrame:
    """Compute a deterministic cell->tile map: start at ``base_res``,
    split any tile above ``target_rows`` into its 4 children, repeat.
    Returns a pandas DataFrame (tile_id, res, row_count) — dimension
    sized (one row per tile), intended to be broadcast.
    """
    counts = (
        df.groupBy(F.expr(cell_expr_sql(lon_col, lat_col, base_res)).alias("cell"))
        .count()
        .toPandas()
    )
    final: list[tuple[int, int, int]] = []
    frontier = [(int(c), base_res, int(n)) for c, n in zip(counts["cell"], counts["count"])]
    res = base_res
    while frontier and res < max_res:
        res += 1
        hot = [(c, r, n) for c, r, n in frontier if n > target_rows]
        final.extend((c, r, n) for c, r, n in frontier if n <= target_rows)
        if not hot:
            frontier = []
            break
        # one aggregation pass at the next res, restricted to hot parents
        hot_cells = {c for c, _, _ in hot}
        child_of = {}
        for c, r, _ in hot:
            for ch in children(np.int64(c), r).ravel().tolist():
                child_of[int(ch)] = c
        sub = (
            df.groupBy(F.expr(cell_expr_sql(lon_col, lat_col, res)).alias("cell"))
            .count()
            .filter(F.col("cell").isin(list(child_of.keys())))
            .toPandas()
        )
        frontier = [(int(c), res, int(n)) for c, n in zip(sub["cell"], sub["count"])]
    final.extend(frontier)
    out = pd.DataFrame(final, columns=["tile_id", "res", "row_count"]).sort_values("tile_id")
    return out.reset_index(drop=True)


def assign_adaptive(df: DataFrame, tile_map: pd.DataFrame, lon_col: str = "xmin", lat_col: str = "ymin") -> DataFrame:
    """Assign each row its adaptive tile: compute the cell at every res
    present in the map and coalesce through a broadcast lookup join."""
    spark = df.sparkSession
    lookup = F.broadcast(spark.createDataFrame(tile_map[["tile_id", "res"]], schema="tile_id bigint, res int"))
    out = df
    resolutions = sorted(tile_map["res"].unique().tolist())
    assigned = None
    for r in resolutions:
        cand = out.withColumn("_cand", F.expr(cell_expr_sql(lon_col, lat_col, int(r))))
        hit = cand.join(lookup.filter(F.col("res") == int(r)), cand["_cand"] == lookup["tile_id"], "left_semi")
        hit = hit.withColumn("tile_id", F.col("_cand")).drop("_cand")
        assigned = hit if assigned is None else assigned.unionByName(hit)
        out = cand.join(
            lookup.filter(F.col("res") == int(r)), cand["_cand"] == lookup["tile_id"], "left_anti"
        ).drop("_cand")
    return assigned
