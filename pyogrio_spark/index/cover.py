"""Polygon -> covering cell set (polyfill) with full/partial flags.

The analogue of H3 polyfill, but each cell carries ``full_cover``:
points in a fully-covered cell need no exact PIP refine at join time.
At scale this turns most of a PIP join into a pure integer equi-join
(interior cells dominate for large polygons).

Classification is vectorized across the whole candidate cell grid:
one segment-vs-box test over (edges x cells) and one batched PIP over
all cell corners — no per-cell Python loop.
"""

from __future__ import annotations

import numpy as np

from pyogrio_spark.geometry.predicates import PreparedPolygon
from pyogrio_spark.index.grid import cell_bounds, cover_bbox


def _edges_hit_boxes(rings: list[np.ndarray], bx0, by0, bx1, by1) -> np.ndarray:
    """bool[n_cells]: any ring edge intersects each box (separating-axis
    test vectorized over edges x cells)."""
    hit = np.zeros(bx0.shape[0], dtype=bool)
    for ring in rings:
        x0, y0 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
        x1, y1 = ring[1:, 0][:, None], ring[1:, 1][:, None]
        BX0, BY0, BX1, BY1 = bx0[None, :], by0[None, :], bx1[None, :], by1[None, :]
        overlap = (
            (np.minimum(x0, x1) <= BX1)
            & (np.maximum(x0, x1) >= BX0)
            & (np.minimum(y0, y1) <= BY1)
            & (np.maximum(y0, y1) >= BY0)
        )
        dx, dy = x1 - x0, y1 - y0
        s1 = dx * (BY0 - y0) - dy * (BX0 - x0)
        s2 = dx * (BY0 - y0) - dy * (BX1 - x0)
        s3 = dx * (BY1 - y0) - dy * (BX0 - x0)
        s4 = dx * (BY1 - y0) - dy * (BX1 - x0)
        all_pos = (s1 > 0) & (s2 > 0) & (s3 > 0) & (s4 > 0)
        all_neg = (s1 < 0) & (s2 < 0) & (s3 < 0) & (s4 < 0)
        hit |= (overlap & ~(all_pos | all_neg)).any(axis=0)
    return hit


def cover_polygon(wkb: bytes, res: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (cells int64[n], full_cover bool[n]) for cells intersecting the
    polygon. Cells whose box misses the polygon entirely are dropped."""
    prep = PreparedPolygon(wkb)
    cand = cover_bbox(*prep.bbox, res)
    if cand.size == 0:
        return cand, np.zeros(0, dtype=bool)
    bx0, by0, bx1, by1 = cell_bounds(cand, res)

    edge_hit = _edges_hit_boxes(prep.rings, bx0, by0, bx1, by1)

    # all 4 corners of each box, one batched PIP call
    cx = np.concatenate([bx0, bx1, bx0, bx1])
    cy = np.concatenate([by0, by0, by1, by1])
    inside = prep.contains_points(cx, cy).reshape(4, cand.size)
    corners_in_all = inside.all(axis=0)
    corners_in_any = inside.any(axis=0)

    full = corners_in_all & ~edge_hit
    # partial: boundary passes through, or a corner is inside, or the box
    # swallows the polygon entirely (then every candidate box overlaps bbox)
    xmin, ymin, xmax, ymax = prep.bbox
    contains_poly = (bx0 <= xmin) & (bx1 >= xmax) & (by0 <= ymin) & (by1 >= ymax)
    partial = (edge_hit | corners_in_any | contains_poly) & ~full
    keep = full | partial
    return cand[keep], full[keep]
