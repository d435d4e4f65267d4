"""Polygon -> covering cell set (polyfill) with full/partial flags.

The analogue of H3 polyfill, but each cell carries ``full_cover``:
points in a fully-covered cell need no exact PIP refine at join time.
At scale this turns most of a PIP join into a pure integer equi-join
(interior cells dominate for large polygons).
"""

from __future__ import annotations

import numpy as np

from pyogrio_spark.geometry.predicates import PreparedPolygon
from pyogrio_spark.index.grid import cell_bounds, cover_bbox


def cover_polygon(wkb: bytes, res: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (cells int64[n], full_cover bool[n]) for cells intersecting the
    polygon. Cells whose box misses the polygon entirely are dropped."""
    prep = PreparedPolygon(wkb)
    cand = cover_bbox(*prep.bbox, res)
    keep, full = [], []
    for c in cand:
        bx0, by0, bx1, by1 = cell_bounds(np.int64(c), None)
        cls = prep.classify_box(float(bx0), float(by0), float(bx1), float(by1))
        if cls == "none":
            continue
        keep.append(int(c))
        full.append(cls == "full")
    return np.asarray(keep, dtype=np.int64), np.asarray(full, dtype=bool)
