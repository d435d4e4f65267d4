"""Curve/surface linearization parity with the reference scan behavior:
non-linear WKB (type codes 8-12) is linearized at parse, mirroring
OGR_G_GetLinearGeometry (/root/reference/pyogrio/_io.pyx:1015-1017) and
the documented downgrades (/root/reference/pyogrio/tests/test_core.py:311-316,
test_geopandas_io.py:3046-3060). Golden inputs are the reference's own
curve fixtures, read straight out of the GPKG blobs."""

import sqlite3
import struct

import numpy as np
import pytest

from pyogrio_spark.geometry import wkb as W

FIXDIR = "/root/reference/pyogrio/tests/fixtures"


def gpkg_wkbs(path):
    con = sqlite3.connect(path)
    tables = [r[0] for r in con.execute("SELECT table_name FROM gpkg_contents WHERE data_type='features'")]
    out = []
    for t in tables:
        gcol = con.execute("SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?", (t,)).fetchone()[0]
        for (blob,) in con.execute(f'SELECT "{gcol}" FROM "{t}"'):
            if blob is None:
                continue
            assert blob[:2] == b"GP"
            env_ind = (blob[3] >> 1) & 0x07
            env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_ind]
            out.append(bytes(blob[8 + env_len:]))
    return out


@pytest.mark.parametrize(
    "fixture,want_type",
    [("curve", "LineString"), ("curvepolygon", "Polygon"), ("multisurface", "MultiPolygon")],
)
def test_reference_curve_fixtures_downgrade(fixture, want_type):
    wkbs = gpkg_wkbs(f"{FIXDIR}/{fixture}.gpkg")
    assert wkbs, f"no geometry in {fixture}.gpkg"
    for wkb in wkbs:
        g = W.parse_wkb(wkb)
        assert g.type == want_type
        # header peek reports the downgraded type like list_layers does
        assert W.geom_type_name(wkb).split(" ")[0] == want_type
        # normalizer round-trips to plain linear WKB
        assert W.parse_wkb(W.linearize_wkb(wkb)).type == want_type


def test_semicircle_linearization_geometry():
    # arc through (-1,0),(0,1),(1,0): unit semicircle, 45 segments at 4deg
    cs = W.encode_circularstrings([-1.0], [0.0], [0.0], [1.0], [1.0], [0.0])[0]
    g = W.parse_wkb(cs)
    assert g.type == "LineString"
    pts = g.coords
    assert len(pts) == 46  # ceil(180/4) + 1
    # endpoints verbatim
    assert tuple(pts[0]) == (-1.0, 0.0) and tuple(pts[-1]) == (1.0, 0.0)
    # every sample on the unit circle, upper half
    r = np.hypot(pts[:, 0], pts[:, 1])
    assert np.allclose(r, 1.0, atol=1e-12)
    assert (pts[1:-1, 1] > 0).all()
    # passes through the defining mid point's neighborhood
    assert np.hypot(pts[:, 0] - 0.0, pts[:, 1] - 1.0).min() < 0.1


def test_collinear_arc_degrades_to_segments():
    cs = W.encode_circularstrings([0.0], [0.0], [1.0], [1.0], [2.0], [2.0])[0]
    g = W.parse_wkb(cs)
    assert g.type == "LineString"
    assert np.array_equal(g.coords, [[0, 0], [1, 1], [2, 2]])


def test_full_circle_convention():
    # p0 == p2: full circle with p1 antipodal (center (0,0), radius 1)
    cs = W.encode_circularstrings([-1.0], [0.0], [1.0], [0.0], [-1.0], [0.0])[0]
    g = W.parse_wkb(cs)
    pts = g.coords
    assert len(pts) == 91  # ceil(360/4) + 1
    assert np.allclose(np.hypot(pts[:, 0], pts[:, 1]), 1.0, atol=1e-12)
    assert np.array_equal(pts[0], pts[-1])


def test_multicurve_and_compound():
    # CompoundCurve: straight segment + quarter arc
    seg = W.encode_linestring(np.array([[0.0, 0.0], [1.0, 0.0]]))
    arc = W.encode_circularstrings([1.0], [0.0], [2.0], [1.0], [3.0], [0.0])[0]
    compound = b"\x01\x09\x00\x00\x00" + struct.pack("<I", 2) + seg + arc
    g = W.parse_wkb(compound)
    assert g.type == "LineString"
    assert tuple(g.coords[0]) == (0.0, 0.0) and tuple(g.coords[-1]) == (3.0, 0.0)
    # join vertex deduplicated
    assert not (np.diff(g.coords, axis=0) == 0).all(axis=1).any()
    # MultiCurve of the compound + a plain line
    mc = b"\x01\x0b\x00\x00\x00" + struct.pack("<I", 2) + compound + seg
    gm = W.parse_wkb(mc)
    assert gm.type == "MultiLineString" and len(gm.coords) == 2


def test_curvepolygon_ring_closure():
    # CurvePolygon with one full-circle ring
    circle = W.encode_circularstrings([-1.0], [0.0], [1.0], [0.0], [-1.0], [0.0])[0]
    cp = b"\x01\x0a\x00\x00\x00" + struct.pack("<I", 1) + circle
    g = W.parse_wkb(cp)
    assert g.type == "Polygon" and len(g.coords) == 1
    ring = g.coords[0]
    assert np.array_equal(ring[0], ring[-1])
    # linearized circle is usable by the predicate kernels
    from pyogrio_spark.geometry.predicates import PreparedPolygon

    prep = PreparedPolygon(W.linearize_wkb(cp))
    assert prep.contains_points(np.array([0.0]), np.array([0.0]))[0]
    assert not prep.contains_points(np.array([2.0]), np.array([0.0]))[0]
