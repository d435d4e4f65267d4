"""Point-in-polygon spatial join.

pyogrio users get this from geopandas.sjoin / shapely STRtree on one
node (the reference's own canonical spatial join is an ST_Intersects
SQL passthrough, /root/reference/docs/source/introduction.md:291-307;
its mask filter has the same intersects semantics,
/root/reference/pyogrio/_io.pyx:887-908). Cluster plan:

1. **Cover**: each polygon -> covering cells at res R with a
   ``full_cover`` flag (interior cells).
2. **Coarse join**: docs ⋈ cover on ``cell_id`` — a pure integer
   equi-join. A dimension-sized cover side is ``broadcast()`` so the
   docs side never shuffles; a huge polygon side falls back to a
   shuffle hash join where AQE skew-join plus optional explicit
   salting (``salt``) split hot coastline/metro cells.
3. **Refine**: rows in ``full_cover`` cells pass with no geometry test
   (at planetary scale interior cells dominate — most of the join does
   zero geometry work). Boundary-cell rows get the exact vectorized
   PIP refine, grouped per polygon inside each Arrow batch so a
   polygon is prepared once per batch (prepared-STRtree pattern).

Output: one row per (doc, zone) pair; doc payload (span sequences)
passes through untouched.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyogrio_spark.geometry.predicates import PreparedPolygon
from pyogrio_spark.index.cover import cover_polygon

DEFAULT_RES = 7


def _is_rectangle(wkb: bytes) -> tuple[bool, tuple]:
    """A single-ring 5-point polygon whose vertices are exactly its bbox
    corners. For such zones the exact PIP refine degenerates to an interval
    predicate — evaluable JVM-side with no geometry parsing (the envelope-
    exactness shortcut of /root/reference/pyogrio/core.py:207-212)."""
    try:
        prep = PreparedPolygon(wkb)
    except Exception:
        return False, ()
    if len(prep.rings) != 1 or prep.rings[0].shape[0] != 5:
        return False, prep.bbox
    xmin, ymin, xmax, ymax = prep.bbox
    corners = {(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)}
    pts = {(float(x), float(y)) for x, y in prep.rings[0][:4]}
    return pts == corners, prep.bbox


def _cover_rows(zones_iter, res: int, zone_key: str, geom_col: str):
    rows = []
    for _, z in zones_iter:
        wkb = bytes(z[geom_col])
        cells, full = cover_polygon(wkb, res)
        is_rect, bbox = _is_rectangle(wkb)
        for c, f in zip(cells.tolist(), full.tolist()):
            rows.append((int(c), z[zone_key], bool(f), wkb, is_rect, *bbox))
    return pd.DataFrame(
        rows,
        columns=["cell_id", zone_key, "full_cover", geom_col, "is_rect", "zxmin", "zymin", "zxmax", "zymax"],
    )


def zones_cell_cover(
    spark: SparkSession,
    zones: pd.DataFrame,
    res: int = DEFAULT_RES,
    zone_key: str = "fid",
    geom_col: str = "geometry_wkb",
) -> DataFrame:
    """Explode polygons into (cell_id, zone_key, full_cover, geometry_wkb).

    Driver-side for dimension-sized zone tables (admin boundaries,
    1e2-1e5 polygons — the common case); use
    ``zones_cell_cover_distributed`` when the polygon side is itself big.
    """
    pdf = _cover_rows(zones.iterrows(), res, zone_key, geom_col)
    ztype = "bigint" if pd.api.types.is_integer_dtype(zones[zone_key]) else "string"
    return spark.createDataFrame(
        pdf,
        schema=(
            f"cell_id bigint, {zone_key} {ztype}, full_cover boolean, {geom_col} binary, "
            "is_rect boolean, zxmin double, zymin double, zxmax double, zymax double"
        ),
    )


def zones_cell_cover_distributed(
    zones_df: DataFrame,
    res: int = DEFAULT_RES,
    zone_key: str = "fid",
    geom_col: str = "geometry_wkb",
) -> DataFrame:
    """Same cover computed on executors via mapInPandas — the scale path."""
    ztype = zones_df.schema[zone_key].dataType.simpleString()
    out_schema = (
        f"cell_id bigint, {zone_key} {ztype}, full_cover boolean, {geom_col} binary, "
        "is_rect boolean, zxmin double, zymin double, zxmax double, zymax double"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _cover_rows(pdf.iterrows(), res, zone_key, geom_col)

    return zones_df.select(zone_key, geom_col).mapInPandas(gen, schema=out_schema)


def plan_salt_factors(
    docs: DataFrame, threshold_rows: int, max_salt: int = 64, cell_col: str = "cell_id"
) -> pd.DataFrame:
    """Deterministic per-cell salt plan from a count sketch (SURVEY.md §7
    hard part 4): one cheap groupBy(cell).count(); cells above the
    per-reducer row budget get salt_k = ceil(count/threshold). The plan is
    a pure function of the input snapshot, so a resumed job reproduces the
    identical physical partitioning."""
    counts = (
        docs.groupBy(cell_col).count().filter(F.col("count") > threshold_rows).toPandas()
    )
    if counts.empty:
        return pd.DataFrame(columns=["cell_id", "salt_k"])
    counts["salt_k"] = np.minimum(np.ceil(counts["count"] / threshold_rows), max_salt).astype(int)
    return counts[[cell_col, "salt_k"]].rename(columns={cell_col: "cell_id"})


def point_in_polygon_join(
    docs: DataFrame,
    cover: DataFrame,
    zone_key: str = "fid",
    geom_col: str = "geometry_wkb",
    broadcast_cover: bool = True,
    salt: int = 0,
    salt_plan: pd.DataFrame | None = None,
    keep_doc_cols: list[str] | None = None,
    include_boundary: bool = False,
) -> DataFrame:
    """Join point docs to polygons (PIP / intersects semantics).

    ``docs`` needs ``cell_id`` (same res as ``cover``) and point
    coordinates as envelope columns ``xmin``/``ymin`` (for points
    xmin==lon, ymin==lat — the persisted `read_bounds` columns).
    ``salt`` > 1 applies only to the shuffle-join path: the cover side
    is exploded ×salt and doc rows spread by doc hash, so one hot cell
    lands on ``salt`` reducers instead of one.

    ``include_boundary=True`` switches both refine paths (rect JVM
    interval and generic PIP) to GEOS ``intersects`` boundary semantics:
    a point exactly ON a zone edge joins. Default keeps the engine's
    half-open ray-cast convention (documented divergence).
    """
    if keep_doc_cols is None:
        keep_doc_cols = [c for c in docs.columns if c != geom_col]
    for req in ("cell_id", "xmin", "ymin"):
        if req not in docs.columns:
            raise ValueError(f"docs must carry '{req}' (persist bounds + cell first)")

    zgeom = "_zone_geom"
    cover = cover.withColumnRenamed(geom_col, zgeom)
    ztype = cover.schema[zone_key].dataType.simpleString()
    sel = list(dict.fromkeys(keep_doc_cols + ["xmin", "ymin"]))
    docs_sel = docs.select(*sel, "cell_id") if "cell_id" not in sel else docs.select(*sel)

    if broadcast_cover:
        joined = docs_sel.join(F.broadcast(cover), on="cell_id", how="inner")
    elif salt_plan is not None and len(salt_plan):
        # targeted skew salting: only cells in the plan fan out, and each
        # by its own factor — cold cells pay nothing
        spark = docs_sel.sparkSession
        plan = F.broadcast(
            spark.createDataFrame(salt_plan[["cell_id", "salt_k"]], schema="cell_id bigint, salt_k int")
        )
        cover = (
            cover.join(plan, on="cell_id", how="left")
            .withColumn("_k", F.coalesce(F.col("salt_k"), F.lit(1)))
            .withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("_k") - 1)))
            .drop("salt_k", "_k")
        )
        docs_sel = (
            docs_sel.join(plan, on="cell_id", how="left")
            .withColumn(
                "_salt",
                F.pmod(F.xxhash64(F.col(keep_doc_cols[0])), F.coalesce(F.col("salt_k"), F.lit(1))).cast("int"),
            )
            .drop("salt_k")
        )
        joined = docs_sel.join(cover, on=["cell_id", "_salt"], how="inner").drop("_salt")
    elif salt > 1:
        cover = cover.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        docs_sel = docs_sel.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(keep_doc_cols[0])), F.lit(salt)).cast("int")
        )
        joined = docs_sel.join(cover, on=["cell_id", "_salt"], how="inner").drop("_salt")
    else:
        joined = docs_sel.join(cover, on="cell_id", how="inner")

    out_cols = keep_doc_cols + [zone_key]
    full = joined.filter(F.col("full_cover")).select(*out_cols)

    # rectangle zones: the exact refine IS the interval predicate — stays
    # in whole-stage codegen. Bounds semantics mirror the refine: the
    # even-odd ray cast on an axis-aligned ring is the half-open box
    # [zxmin, zxmax) x [zymin, zymax); boundary-inclusive is the closed box.
    x_hi = F.col("xmin") <= F.col("zxmax") if include_boundary else F.col("xmin") < F.col("zxmax")
    y_hi = F.col("ymin") <= F.col("zymax") if include_boundary else F.col("ymin") < F.col("zymax")
    rect_pass = joined.filter(
        ~F.col("full_cover")
        & F.col("is_rect")
        & (F.col("xmin") >= F.col("zxmin"))
        & x_hi
        & (F.col("ymin") >= F.col("zymin"))
        & y_hi
    ).select(*out_cols)

    boundary = joined.filter(~F.col("full_cover") & ~F.col("is_rect")).select(*out_cols, "xmin", "ymin", zgeom)

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields if f.name in keep_doc_cols]
        + [f"`{zone_key}` {ztype}"]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        prep_cache: dict[bytes, PreparedPolygon] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            lon = pdf["xmin"].to_numpy(dtype=np.float64)
            lat = pdf["ymin"].to_numpy(dtype=np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            for zwkb, idx in pdf.groupby(zgeom, sort=False).indices.items():
                prep = prep_cache.get(zwkb)
                if prep is None:
                    prep = prep_cache[zwkb] = PreparedPolygon(bytes(zwkb))
                keep[idx] = prep.contains_points(lon[idx], lat[idx], include_boundary=include_boundary)
            yield pdf.loc[keep, out_cols]

    refined = boundary.mapInPandas(refine, schema=out_schema)
    return full.unionByName(rect_pass).unionByName(refined)
