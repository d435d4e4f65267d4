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


@given(st.lists(st.tuples(coord, st.floats(min_value=-90, max_value=90, allow_nan=False)), min_size=1, max_size=30),
       st.integers(0, 12))
@settings(max_examples=50, deadline=None)
def test_grid_cell_roundtrip_contains_point(pts, res):
    from pyogrio_spark.index.grid import cell_bounds, cell_of

    lon = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    cells = cell_of(lon, lat, res)
    x0, y0, x1, y1 = cell_bounds(cells, res)
    # every point lies in (or on the closing edge of) its assigned cell
    assert ((lon >= x0 - 1e-9) & (lon <= x1 + 1e-9)).all()
    assert ((lat >= y0 - 1e-9) & (lat <= y1 + 1e-9)).all()
    # resolution is recoverable from the id
    from pyogrio_spark.index.grid import cell_res

    assert (cell_res(cells) == res).all()


@given(st.lists(geometry(), min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_geojson_roundtrip_random_geometries(tmp_path_factory, geoms):
    import pandas as pd

    from pyogrio_spark.io.geojson import read_geojson_pdf, write_geojson

    pdf = pd.DataFrame({"geometry_wkb": geoms, "i": np.arange(len(geoms), dtype=np.int64)})
    p = str(tmp_path_factory.mktemp("gjprop") / "x.geojson")
    write_geojson(pdf, p)
    back = read_geojson_pdf(p)
    assert [bytes(b) for b in back.geometry_wkb] == list(geoms)  # byte identity


@given(st.lists(geometry(), min_size=1, max_size=6))
@settings(max_examples=25, deadline=None)
def test_shapefile_roundtrip_random_geometries(tmp_path_factory, geoms):
    # shapefile normalizes ring orientation, so polygons round-trip
    # semantically (type/bounds/vertex count); points/lines byte-exact
    import pandas as pd

    from pyogrio_spark.io.shapefile import read_shapefile_pdf, write_shapefile

    kinds = {W.geom_type_name(g).split(" ")[0] for g in geoms}
    # one shp layer holds one shape class; pick the first geometry's class
    first = W.geom_type_name(geoms[0]).split(" ")[0]
    cls = {"Point": {"Point"}, "MultiPoint": {"MultiPoint"},
           "LineString": {"LineString", "MultiLineString"},
           "MultiLineString": {"LineString", "MultiLineString"},
           "Polygon": {"Polygon", "MultiPolygon"},
           "MultiPolygon": {"Polygon", "MultiPolygon"}}[first]
    geoms = [g for g in geoms if W.geom_type_name(g).split(" ")[0] in cls]
    pdf = pd.DataFrame({"geometry_wkb": geoms, "i": np.arange(len(geoms), dtype=np.int64)})
    p = str(tmp_path_factory.mktemp("shpprop") / "x.shp")
    write_shapefile(pdf, p)
    back = read_shapefile_pdf(p)[0]
    assert len(back) == len(geoms)
    for orig, rt in zip(geoms, back.geometry_wkb):
        a, b = W.parse_wkb(orig), W.parse_wkb(bytes(rt))
        assert W.bounds(orig) == W.bounds(bytes(rt))
        if a.type in ("Point", "MultiPoint", "LineString", "MultiLineString"):
            assert bytes(rt) == orig


# ------------------------- round-3 additions: hilbert + ring stitching


@given(st.integers(0, (1 << 8) - 1), st.integers(0, (1 << 8) - 1),
       st.integers(0, (1 << 8) - 1), st.integers(0, (1 << 8) - 1))
@settings(max_examples=200, deadline=None)
def test_hilbert_injective_on_grid(x0, y0, x1, y1):
    """hilbert_d is a bijection on the 2^k x 2^k grid: distinct cells
    never collide, and d stays inside [0, 4^k)."""
    from pyogrio_spark.io.flatgeobuf import hilbert_d

    d = hilbert_d(np.array([x0, x1], dtype=np.uint64),
                  np.array([y0, y1], dtype=np.uint64), order=8)
    assert (d < (1 << 16)).all()
    if (x0, y0) != (x1, y1):
        assert d[0] != d[1]


@given(st.integers(0, (1 << 8) - 2), st.integers(0, (1 << 8) - 2))
@settings(max_examples=100, deadline=None)
def test_hilbert_locality_unit_step(x, y):
    """The defining curve property: horizontally/vertically adjacent
    cells are exactly distance-1 neighbors along the curve for at least
    one of the two unit steps (the curve is a Hamiltonian path, so every
    cell has a curve-adjacent grid neighbor)."""
    from pyogrio_spark.io.flatgeobuf import hilbert_d

    xs = np.array([x, x + 1, x], dtype=np.uint64)
    ys = np.array([y, y, y + 1], dtype=np.uint64)
    d = hilbert_d(xs, ys, order=8)
    assert min(abs(int(d[1]) - int(d[0])), abs(int(d[2]) - int(d[0]))) >= 1


@st.composite
def split_ring(draw):
    """A convex-ish closed ring split into consecutive segments, each
    possibly reversed, in shuffled order."""
    n = draw(st.integers(4, 12))
    ang = np.sort(np.array([draw(st.floats(0, 6.28, allow_nan=False)) for _ in range(n)]))
    ang = np.unique(ang)
    if len(ang) < 4:
        ang = np.linspace(0, 6.0, 5)
    ring = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    ring = np.vstack([ring, ring[:1]])  # closed
    # cut points
    k = draw(st.integers(2, min(5, len(ring) - 1)))
    cuts = sorted(draw(st.lists(st.integers(1, len(ring) - 2), min_size=k - 1,
                                max_size=k - 1, unique=True)))
    segs = []
    prev = 0
    for c in cuts + [len(ring) - 1]:
        seg = ring[prev : c + 1]
        if len(seg) >= 2:
            segs.append(seg[::-1].copy() if draw(st.booleans()) else seg.copy())
        prev = c
    order = draw(st.permutations(range(len(segs))))
    return ring, [segs[i] for i in order]


@given(split_ring())
@settings(max_examples=60, deadline=None)
def test_stitch_rings_reassembles_split_ring(data):
    """OSM multipolygon ring stitching: any consecutive segmentation of
    a closed ring, with arbitrary per-segment reversal and order, must
    reassemble into exactly one closed ring over the same vertex set."""
    from pyogrio_spark.io.osm_pbf import _stitch_rings

    ring, segs = data
    out = _stitch_rings(segs)
    assert len(out) == 1
    got = out[0]
    assert np.array_equal(got[0], got[-1])
    assert {tuple(p) for p in got} == {tuple(p) for p in ring}
