"""Property-based tests (hypothesis): WKB round-trip identity for random
geometries and batch-vs-per-row predicate equivalence on random batches."""

import numpy as np
from hypothesis import given, settings, strategies as st

from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.geometry.predicates import PreparedPolygon, batch_intersects, batch_intersects_box

coord = st.floats(min_value=-180, max_value=180, allow_nan=False, width=64)


@st.composite
def geometry(draw, max_pts=8):
    kind = draw(st.sampled_from(["point", "line", "poly", "multipoint", "multipoly"]))
    def pts(n_min=2):
        n = draw(st.integers(n_min, max_pts))
        return np.array([[draw(coord), draw(coord)] for _ in range(n)], dtype=np.float64)
    if kind == "point":
        return W.encode_point(draw(coord), draw(coord))
    if kind == "line":
        return W.encode_linestring(pts(2))
    if kind == "multipoint":
        return W.encode_multipoint(pts(1))
    if kind == "poly":
        ring = pts(3)
        return W.encode_polygon([np.vstack([ring, ring[:1]])])
    rings = []
    for _ in range(draw(st.integers(1, 3))):
        r = pts(3)
        rings.append([np.vstack([r, r[:1]])])
    return W.encode_multipolygon(rings)


@given(st.lists(geometry(), min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_wkb_roundtrip_identity(geoms):
    for b in geoms:
        g = W.parse_wkb(b)
        b2 = W.encode_geom(g)
        g2 = W.parse_wkb(b2)
        assert g2.type == g.type
        assert W.encode_geom(g2) == b2  # re-encode is a fixed point
        assert W.bounds(b) == W.bounds(b2)


@given(st.lists(geometry(), min_size=1, max_size=16))
@settings(max_examples=40, deadline=None)
def test_batch_intersects_equals_per_row(geoms):
    outer = np.array([(-40, -40), (40, -40), (50, 10), (0, 44), (-48, 20), (-40, -40)], dtype=float)
    hole = np.array([(-10, -10), (10, -10), (10, 10), (-10, 10), (-10, -10)], dtype=float)
    prep = PreparedPolygon(W.encode_polygon([outer, hole]))
    arr = np.array(geoms, dtype=object)
    got = batch_intersects(prep, arr)
    want = np.array([prep.intersects_geom(bytes(g)) for g in geoms])
    assert (got == want).all()


@given(st.lists(geometry(), min_size=1, max_size=16))
@settings(max_examples=40, deadline=None)
def test_batch_box_consistent_with_envelope(geoms):
    # necessary condition: intersects(box) implies envelope overlap (closed)
    arr = np.array(geoms, dtype=object)
    got = batch_intersects_box(-30.0, -20.0, 25.0, 35.0, arr)
    for b, hit in zip(geoms, got):
        x0, y0, x1, y1 = W.bounds(b)
        env_overlap = x0 <= 25.0 and x1 >= -30.0 and y0 <= 35.0 and y1 >= -20.0
        if hit:
            assert env_overlap
        if not env_overlap:
            assert not hit
