"""Single-node oracle: brute-force reference results on pandas frames.

Plays the role pyogrio's fixture goldens + shapely STRtree play in the
reference's test suite (/root/reference/pyogrio/tests/test_geopandas_io.py:
hard-coded bbox/where expected ID sets at :1420-1461). Deliberately
*algorithm-free*: no grid, no pruning — every pair is evaluated, so an
engine bug in the pruning layers cannot be mirrored here. Shares only
the low-level predicate kernels (identical boundary conventions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyogrio_spark.geometry.predicates import PreparedPolygon
from pyogrio_spark.index.grid import cell_of


def oracle_pip_join(docs: pd.DataFrame, zones: pd.DataFrame, zone_key: str = "fid") -> pd.DataFrame:
    """Every (doc, zone) pair where the doc point is inside the zone."""
    lon = docs["xmin"].to_numpy(dtype=np.float64)
    lat = docs["ymin"].to_numpy(dtype=np.float64)
    out = []
    for _, z in zones.iterrows():
        prep = PreparedPolygon(bytes(z["geometry_wkb"]))
        hit = prep.contains_points(lon, lat)
        for d in docs.loc[hit, "doc_id"]:
            out.append((d, z[zone_key]))
    return pd.DataFrame(out, columns=["doc_id", zone_key]).sort_values(["doc_id", zone_key]).reset_index(drop=True)


def oracle_knn(probes: pd.DataFrame, docs: pd.DataFrame, k: int) -> pd.DataFrame:
    """Brute-force planar kNN with (dist, doc_id) tie-break."""
    dlon = docs["xmin"].to_numpy(dtype=np.float64)
    dlat = docs["ymin"].to_numpy(dtype=np.float64)
    dids = docs["doc_id"].to_numpy()
    rows = []
    for _, p in probes.iterrows():
        # rank by sqrt(d2) to mirror the engine: sqrt rounding can tie
        # two unequal d2 values (tie-break then falls to doc_id)
        d = np.sqrt((dlon - p["lon"]) ** 2 + (dlat - p["lat"]) ** 2)
        order = np.lexsort((dids, d))[:k]
        for rank, i in enumerate(order, start=1):
            rows.append((p["probe_id"], dids[i], float(d[i]), rank))
    return pd.DataFrame(rows, columns=["probe_id", "doc_id", "dist", "rank"])


def oracle_range_join(left: pd.DataFrame, boxes: pd.DataFrame, box_key: str = "box_id") -> pd.DataFrame:
    out = []
    for _, b in boxes.iterrows():
        hit = (
            (left["xmin"] <= b.xmax)
            & (left["xmax"] >= b.xmin)
            & (left["ymin"] <= b.ymax)
            & (left["ymax"] >= b.ymin)
        )
        for d in left.loc[hit, "doc_id"]:
            out.append((d, b[box_key]))
    return pd.DataFrame(out, columns=["doc_id", box_key]).sort_values(["doc_id", box_key]).reset_index(drop=True)


def oracle_zonal(tiles: pd.DataFrame, zones: pd.DataFrame, tile_deg: float, zone_key: str = "fid") -> pd.DataFrame:
    cx = (tiles["tile_x"].to_numpy(dtype=np.float64) + 0.5) * tile_deg
    cy = (tiles["tile_y"].to_numpy(dtype=np.float64) + 0.5) * tile_deg
    val = tiles["value"].to_numpy(dtype=np.float64)
    rows = []
    for _, z in zones.iterrows():
        prep = PreparedPolygon(bytes(z["geometry_wkb"]))
        m = prep.contains_points(cx, cy)
        if m.any():
            v = val[m]
            rows.append((z[zone_key], int(m.sum()), float(v.sum()), float(v.mean()), float(v.min()), float(v.max())))
    return pd.DataFrame(rows, columns=[zone_key, "tile_count", "value_sum", "value_mean", "value_min", "value_max"])


def oracle_tiles(docs: pd.DataFrame, res: int) -> pd.DataFrame:
    lon = docs["xmin"].to_numpy(dtype=np.float64)
    lat = docs["ymin"].to_numpy(dtype=np.float64)
    return pd.DataFrame({"doc_id": docs["doc_id"], "tile_id": cell_of(lon, lat, res)})


def oracle_bbox_filter(docs: pd.DataFrame, bbox) -> pd.DataFrame:
    xmin, ymin, xmax, ymax = bbox
    hit = (docs["xmin"] <= xmax) & (docs["xmax"] >= xmin) & (docs["ymin"] <= ymax) & (docs["ymax"] >= ymin)
    return docs.loc[hit].reset_index(drop=True)


def oracle_mask_filter(docs: pd.DataFrame, mask_wkb: bytes) -> pd.DataFrame:
    prep = PreparedPolygon(mask_wkb)
    hit = prep.contains_points(docs["xmin"].to_numpy(np.float64), docs["ymin"].to_numpy(np.float64))
    return docs.loc[hit].reset_index(drop=True)
