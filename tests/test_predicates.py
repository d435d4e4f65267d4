import numpy as np

from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.geometry.predicates import PreparedPolygon, points_in_polygon, seg_intersects_box
from pyogrio_spark.index.cover import cover_polygon
from pyogrio_spark.index.grid import cell_bounds, cell_of


SQ = np.array([(0.0, 0.0), (10, 0), (10, 10), (0, 10), (0, 0)])
HOLE = np.array([(4.0, 4.0), (6, 4), (6, 6), (4, 6), (4, 4)])


def test_pip_square():
    b = W.encode_polygon([SQ])
    px = np.array([5.0, -1.0, 11.0, 9.99])
    py = np.array([5.0, 5.0, 5.0, 9.99])
    got = points_in_polygon(px, py, b)
    assert got.tolist() == [True, False, False, True]


def test_pip_hole():
    b = W.encode_polygon([SQ, HOLE])
    px = np.array([5.0, 3.0, 4.5])
    py = np.array([5.0, 3.0, 5.0])
    assert points_in_polygon(px, py, b).tolist() == [False, True, False]


def test_pip_multipolygon():
    b = W.encode_multipolygon([[SQ], [SQ + 100]])
    px = np.array([5.0, 105.0, 50.0])
    py = np.array([5.0, 105.0, 50.0])
    assert points_in_polygon(px, py, b).tolist() == [True, True, False]


def test_prepared_matches_plain():
    rng = np.random.default_rng(3)
    px = rng.uniform(-2, 12, 500)
    py = rng.uniform(-2, 12, 500)
    b = W.encode_polygon([SQ, HOLE])
    prep = PreparedPolygon(b)
    np.testing.assert_array_equal(prep.contains_points(px, py), points_in_polygon(px, py, b))


def test_seg_box():
    # crossing, inside, outside-separated, touching-bbox-but-separated
    got = seg_intersects_box(
        np.array([-1.0, 1.0, -5.0, -1.0]),
        np.array([5.0, 1.0, -5.0, 11.0]),
        np.array([11.0, 2.0, -3.0, 11.0]),
        np.array([5.0, 2.0, -4.0, -1.0]),
        0.0, 0.0, 10.0, 10.0,
    )
    assert got.tolist()[:3] == [True, True, False]


def test_classify_box():
    prep = PreparedPolygon(W.encode_polygon([SQ]))
    assert prep.classify_box(2, 2, 3, 3) == "full"
    assert prep.classify_box(-1, -1, 1, 1) == "partial"
    assert prep.classify_box(20, 20, 30, 30) == "none"
    assert prep.classify_box(-5, -5, 15, 15) == "partial"  # box contains polygon
    prep_h = PreparedPolygon(W.encode_polygon([SQ, HOLE]))
    assert prep_h.classify_box(4.4, 4.4, 5.6, 5.6) == "none"  # box fully inside the hole
    assert prep_h.classify_box(3.5, 3.5, 4.5, 4.5) == "partial"  # straddles the hole edge
    assert prep_h.classify_box(1.0, 1.0, 2.0, 2.0) == "full"


def test_cover_polygon_flags_agree_with_pip():
    b = W.encode_polygon([SQ])
    res = 7
    cells, full = cover_polygon(b, res)
    assert len(cells) > 0
    prep = PreparedPolygon(b)
    for c, f in zip(cells, full):
        x0, y0, x1, y1 = (float(v) for v in cell_bounds(np.int64(c), res))
        # sample the cell center: full cells must contain it
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        if f:
            assert prep.contains_points(np.array([cx]), np.array([cy]))[0]
    # every point inside the polygon maps to a covered cell
    rng = np.random.default_rng(5)
    px = rng.uniform(0, 10, 200)
    py = rng.uniform(0, 10, 200)
    inside = prep.contains_points(px, py)
    pc = cell_of(px[inside], py[inside], res)
    cellset = set(cells.tolist())
    assert all(int(c) in cellset for c in pc)
