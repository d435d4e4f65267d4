"""Range (bbox-interval) join.

The reference's bbox filter is a single-box special case
(/root/reference/pyogrio/_io.pyx:862-884, OGR_L_SetSpatialFilterRect);
the join form pairs every left row with every query box whose envelope
intersects it. Plan: explode each query box into covering cells
(pure arithmetic), broadcast-join on cell_id, then refine with the
plain conjunctive interval predicate — all JVM-side, no UDF at all,
since envelope-vs-envelope intersects needs no geometry parsing.

Cells de-duplicate the multi-cell boxes with a final dropDuplicates on
the pair key (a box spanning c cells would otherwise emit c copies).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyogrio_spark.index.grid import cover_bbox

DEFAULT_RES = 7


def boxes_cell_cover(
    spark: SparkSession,
    boxes: pd.DataFrame,
    res: int = DEFAULT_RES,
    box_key: str = "box_id",
) -> DataFrame:
    # itertuples, not iterrows: iterrows upcasts mixed int/float rows to
    # float64, turning an int64 box_id into 0.0 and failing the bigint
    # schema check in createDataFrame.
    key_is_int = pd.api.types.is_integer_dtype(boxes[box_key])
    rows = []
    for b in boxes.itertuples(index=False):
        key = getattr(b, box_key)
        key = int(key) if key_is_int else str(key)
        for c in cover_bbox(b.xmin, b.ymin, b.xmax, b.ymax, res).tolist():
            rows.append((int(c), key, float(b.xmin), float(b.ymin), float(b.xmax), float(b.ymax)))
    pdf = pd.DataFrame(rows, columns=["cell_id", box_key, "bxmin", "bymin", "bxmax", "bymax"])
    ktype = "bigint" if key_is_int else "string"
    return spark.createDataFrame(
        pdf, schema=f"cell_id bigint, {box_key} {ktype}, bxmin double, bymin double, bxmax double, bymax double"
    )


def bbox_range_join(
    left: DataFrame,
    box_cover: DataFrame,
    box_key: str = "box_id",
    left_key: str = "doc_id",
    keep_left_cols: list[str] | None = None,
) -> DataFrame:
    """left (with cell_id + envelope cols) ⋈ query boxes, intersects
    semantics on envelopes. Pure equi-join + comparisons."""
    keep = keep_left_cols or [left_key]
    joined = left.join(F.broadcast(box_cover), on="cell_id", how="inner").filter(
        (F.col("xmin") <= F.col("bxmax"))
        & (F.col("xmax") >= F.col("bxmin"))
        & (F.col("ymin") <= F.col("bymax"))
        & (F.col("ymax") >= F.col("bymin"))
    )
    return joined.select(*keep, box_key).dropDuplicates([left_key, box_key])
