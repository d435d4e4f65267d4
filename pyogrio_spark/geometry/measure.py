"""Planar measurement + coordinate-transform kernels over parsed Geoms.

These are the column functions a geopandas user reaches for after the
I/O layer (`GeoSeries.area/length/centroid/convex_hull/simplify`,
`to_crs`): pure-numpy per-geometry kernels, applied in Arrow-batched
pandas UDFs (see functions/geo.py wrappers) — the engine carries no
GEOS, so everything here is implemented from the standard published
algorithms (shoelace, monotone chain, Douglas-Peucker, spherical
Mercator). Semantics notes per function; all measures are PLANAR in
the geometry's own coordinates (geopandas parity: shapely is planar
too — users reproject first for metric answers, and `to_mercator`
below covers the common case).
"""

from __future__ import annotations

import numpy as np

from pyogrio_spark.geometry import wkb as W

WEB_MERCATOR_R = 6378137.0


# ---------------------------------------------------------------- measures


def _ring_area_signed(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    # sequential shoelace sum (matches a left-to-right SQL oracle more
    # closely than pairwise np.sum on long rings; rounding still applies)
    s = 0.0
    for i in range(len(r) - 1):
        s += x[i] * y[i + 1] - x[i + 1] * y[i]
    return 0.5 * s


def _poly_rings(g: "W.Geom"):
    if g.type == "Polygon":
        yield from g.coords
    elif g.type == "MultiPolygon":
        for p in g.coords:
            yield from p.coords


def area(g: "W.Geom | None") -> float:
    """Planar area: |outer| - |holes| per polygon (shoelace); 0 for
    points/lines, sum over collection members."""
    if g is None:
        return 0.0
    if g.type == "GeometryCollection":
        return float(sum(area(p) for p in g.coords))
    if g.type == "Polygon":
        rings = list(g.coords)
    elif g.type == "MultiPolygon":
        return float(sum(area(p) for p in g.coords))
    else:
        return 0.0
    total = abs(_ring_area_signed(np.asarray(rings[0], dtype=np.float64)))
    for h in rings[1:]:
        total -= abs(_ring_area_signed(np.asarray(h, dtype=np.float64)))
    return float(total)


def _path_length(c: np.ndarray) -> float:
    d = np.diff(np.asarray(c[:, :2], dtype=np.float64), axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def length(g: "W.Geom | None") -> float:
    """Planar length: line length; polygon PERIMETER incl. holes
    (geopandas .length semantics); 0 for points."""
    if g is None:
        return 0.0
    if g.type == "LineString":
        return _path_length(g.coords)
    if g.type in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return float(sum(length(p) for p in g.coords))
    if g.type == "Polygon":
        return float(sum(_path_length(np.asarray(r)) for r in g.coords))
    return 0.0


def centroid(g: "W.Geom | None") -> tuple[float, float]:
    """Centroid of the highest-dimension component set (GEOS
    convention): area-weighted for (multi)polygons (holes subtract),
    length-weighted for (multi)lines, vertex mean for points."""
    if g is None:
        return (float("nan"), float("nan"))
    if g.type in ("Polygon", "MultiPolygon"):
        sa = sx = sy = 0.0
        for r in _poly_rings(g):
            r = np.asarray(r, dtype=np.float64)
            x, y = r[:, 0], r[:, 1]
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            a = cross.sum() / 2.0
            if a == 0.0:
                continue
            sx += float(((x[:-1] + x[1:]) * cross).sum() / 6.0)
            sy += float(((y[:-1] + y[1:]) * cross).sum() / 6.0)
            sa += float(a)
        if sa != 0.0:
            return (sx / sa, sy / sa)
        # degenerate polygon: fall through to line semantics
    if g.type in ("LineString", "MultiLineString", "Polygon", "MultiPolygon"):
        parts = (
            [g.coords] if g.type == "LineString"
            else [p.coords for p in g.coords] if g.type == "MultiLineString"
            else list(_poly_rings(g))
        )
        sl = sx = sy = 0.0
        for c in parts:
            c = np.asarray(c, dtype=np.float64)[:, :2]
            d = np.diff(c, axis=0)
            seg = np.sqrt((d * d).sum(axis=1))
            mid = (c[:-1] + c[1:]) / 2.0
            sl += float(seg.sum())
            sx += float((mid[:, 0] * seg).sum())
            sy += float((mid[:, 1] * seg).sum())
        if sl > 0.0:
            return (sx / sl, sy / sl)
    # points / fully degenerate: vertex mean
    pts = _all_vertices(g)
    return (float(pts[:, 0].mean()), float(pts[:, 1].mean()))


def _all_vertices(g: "W.Geom") -> np.ndarray:
    if g.type == "Point":
        return np.asarray(g.coords, dtype=np.float64).reshape(1, -1)[:, :2]
    if g.type == "LineString":
        return np.asarray(g.coords, dtype=np.float64)[:, :2]
    if g.type == "Polygon":
        return np.concatenate([np.asarray(r, dtype=np.float64)[:, :2] for r in g.coords])
    return np.concatenate([_all_vertices(p) for p in g.coords])


# ------------------------------------------------------------- convex hull


def convex_hull(g: "W.Geom | None") -> bytes | None:
    """Monotone-chain convex hull of all vertices -> Polygon WKB
    (degenerate inputs: Point / LineString, like GEOS)."""
    if g is None:
        return None
    pts = np.unique(_all_vertices(g), axis=0)
    if len(pts) == 1:
        return W.encode_point(float(pts[0, 0]), float(pts[0, 1]))
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            # 2-D cross product spelled out (np.cross on 2-vectors is
            # deprecated from numpy 2.0)
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1], dtype=np.float64)
    if len(hull) < 3:  # collinear
        ends = np.array([pts[0], pts[-1]])
        return W.encode_linestring(ends)
    ring = np.vstack([hull, hull[:1]])
    # CCW shell (GEOS emits CCW hulls)
    if _ring_area_signed(ring) < 0:
        ring = ring[::-1].copy()
    return W.encode_polygon([ring])


# ---------------------------------------------------------------- simplify


def _dp_mask(c: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask over an open coordinate path."""
    n = len(c)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    tol2 = tol * tol
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = c[j] - c[i]
        ll = float(seg @ seg)
        pts = c[i + 1 : j]
        if ll == 0.0:
            d2 = ((pts - c[i]) ** 2).sum(axis=1)
        else:
            t = np.clip(((pts - c[i]) @ seg) / ll, 0.0, 1.0)
            proj = c[i] + t[:, None] * seg
            d2 = ((pts - proj) ** 2).sum(axis=1)
        k = int(np.argmax(d2))
        if d2[k] > tol2:
            keep[i + 1 + k] = True
            stack.append((i, i + 1 + k))
            stack.append((i + 1 + k, j))
    return keep


def simplify(g: "W.Geom | None", tol: float) -> bytes | None:
    """Douglas-Peucker simplification (shapely
    ``simplify(preserve_topology=False)`` semantics — documented: the
    topology-preserving variant needs GEOS). Rings keep closure and are
    dropped if they collapse below 4 points."""
    if g is None:
        return None
    t = g.type
    if t == "Point":
        return W.encode_geom(g)
    if t == "LineString":
        c = np.asarray(g.coords, dtype=np.float64)[:, :2]
        return W.encode_linestring(c[_dp_mask(c, tol)])
    if t == "MultiLineString":
        parts = []
        for p in g.coords:
            c = np.asarray(p.coords, dtype=np.float64)[:, :2]
            parts.append(c[_dp_mask(c, tol)])
        return W.encode_multilinestring(parts)
    if t in ("Polygon", "MultiPolygon"):
        def rings_of(poly_rings):
            out = []
            for r in poly_rings:
                c = np.asarray(r, dtype=np.float64)[:, :2]
                kept = c[_dp_mask(c, tol)]
                if len(kept) >= 4:
                    out.append(kept)
            return out

        if t == "Polygon":
            rr = rings_of(g.coords)
            return W.encode_polygon(rr) if rr else None
        polys = []
        for p in g.coords:
            rr = rings_of(p.coords)
            if rr:
                polys.append(rr)
        return W.encode_multipolygon(polys) if polys else None
    if t == "MultiPoint":
        return W.encode_geom(g)
    if t == "GeometryCollection":
        parts = [simplify(p, tol) for p in g.coords]
        return W.encode_collection([p for p in parts if p is not None])
    raise ValueError(f"cannot simplify geometry type {t}")


# ----------------------------------------------------------- geodesic

EARTH_R = 6371008.8  # mean Earth radius, meters (IUGG)


def _ring_area_sphere(r: np.ndarray) -> float:
    """Signed spherical ring area, m² — the standard spherical-excess
    line integral over edges (the turf.js / Chamberlain-Duquette
    formula): A = R²/2 * Σ (λ2-λ1)(sin φ1 + sin φ2). Exact for
    graticule-aligned edges (meridian edges contribute 0; a parallel
    edge contributes its Δλ·sinφ band term)."""
    lam = np.radians(np.asarray(r[:, 0], dtype=np.float64))
    phi = np.radians(np.asarray(r[:, 1], dtype=np.float64))
    s = 0.0
    for i in range(len(r) - 1):
        s += (lam[i + 1] - lam[i]) * (np.sin(phi[i]) + np.sin(phi[i + 1]))
    return EARTH_R * EARTH_R * s / 2.0


def area_geodesic(g: "W.Geom | None") -> float:
    """Spherical area in m² for lon/lat geometries (|outer| - |holes|);
    0 for points/lines."""
    if g is None:
        return 0.0
    if g.type == "GeometryCollection":
        return float(sum(area_geodesic(p) for p in g.coords))
    if g.type == "MultiPolygon":
        return float(sum(area_geodesic(p) for p in g.coords))
    if g.type != "Polygon":
        return 0.0
    rings = list(g.coords)
    total = abs(_ring_area_sphere(np.asarray(rings[0], dtype=np.float64)))
    for h in rings[1:]:
        total -= abs(_ring_area_sphere(np.asarray(h, dtype=np.float64)))
    return float(total)


def _haversine_path(c: np.ndarray) -> float:
    lam = np.radians(np.asarray(c[:, 0], dtype=np.float64))
    phi = np.radians(np.asarray(c[:, 1], dtype=np.float64))
    dlam = np.diff(lam)
    dphi = np.diff(phi)
    a = np.sin(dphi / 2) ** 2 + np.cos(phi[:-1]) * np.cos(phi[1:]) * np.sin(dlam / 2) ** 2
    return float((2 * EARTH_R * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))).sum())


def length_geodesic(g: "W.Geom | None") -> float:
    """Great-circle length in meters (line length / polygon perimeter
    incl. holes); 0 for points."""
    if g is None:
        return 0.0
    if g.type == "LineString":
        return _haversine_path(np.asarray(g.coords, dtype=np.float64))
    if g.type in ("MultiLineString", "MultiPolygon", "GeometryCollection"):
        return float(sum(length_geodesic(p) for p in g.coords))
    if g.type == "Polygon":
        return float(sum(_haversine_path(np.asarray(r, dtype=np.float64)) for r in g.coords))
    return 0.0


# ------------------------------------------------------------------ clip


def _clip_ring_halfplane(ring: np.ndarray, axis: int, c: float, keep_ge: bool) -> np.ndarray:
    """Sutherland-Hodgman step: clip a closed ring against one
    axis-aligned half-plane (axis 0 = x, 1 = y). Intersections with
    axis-aligned subject edges are exact (the crossing coordinate IS
    the plane constant; the other coordinate interpolates along the
    edge, which is constant for the perpendicular edges of a
    rectangle)."""
    out: list[np.ndarray] = []
    pts = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    for i in range(n):
        cur, nxt = pts[i], pts[(i + 1) % n]
        cur_in = (cur[axis] >= c) if keep_ge else (cur[axis] <= c)
        nxt_in = (nxt[axis] >= c) if keep_ge else (nxt[axis] <= c)
        if cur_in:
            out.append(cur)
        if cur_in != nxt_in:
            d = nxt[axis] - cur[axis]
            t = (c - cur[axis]) / d if d != 0 else 0.0
            p = cur + t * (nxt - cur)
            p[axis] = c  # exact on the clip plane
            out.append(p)
    if len(out) < 3:
        return np.empty((0, 2))
    arr = np.array(out, dtype=np.float64)
    return np.vstack([arr, arr[:1]])


def _clip_ring(ring: np.ndarray, x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)[:, :2]
    for axis, c, keep_ge in ((0, x0, True), (0, x1, False), (1, y0, True), (1, y1, False)):
        r = _clip_ring_halfplane(r, axis, c, keep_ge)
        if len(r) == 0:
            return r
    return r


def _clip_segments(c: np.ndarray, x0, y0, x1, y1) -> list[np.ndarray]:
    """Liang-Barsky per segment, merging consecutive clipped pieces
    that share an endpoint back into paths."""
    paths: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    for i in range(len(c) - 1):
        p, q = c[i, :2].astype(np.float64), c[i + 1, :2].astype(np.float64)
        d = q - p
        t0, t1 = 0.0, 1.0
        ok = True
        for dim, lo, hi in ((0, x0, x1), (1, y0, y1)):
            if d[dim] == 0.0:
                if p[dim] < lo or p[dim] > hi:
                    ok = False
                    break
            else:
                ta = (lo - p[dim]) / d[dim]
                tb = (hi - p[dim]) / d[dim]
                if ta > tb:
                    ta, tb = tb, ta
                t0, t1 = max(t0, ta), min(t1, tb)
                if t0 > t1:
                    ok = False
                    break
        if not ok:
            if len(cur) >= 2:
                paths.append(np.array(cur))
            cur = []
            continue
        a = p + t0 * d if t0 > 0 else p
        b = p + t1 * d if t1 < 1 else q
        if cur and np.array_equal(cur[-1], a):
            cur.append(b)
        else:
            if len(cur) >= 2:
                paths.append(np.array(cur))
            cur = [a, b]
        if t1 < 1:  # exits the window: path breaks here
            paths.append(np.array(cur))
            cur = []
    if len(cur) >= 2:
        paths.append(np.array(cur))
    return [p for p in paths if _path_length(p) > 0]


def clip_by_rect(g: "W.Geom | None", x0: float, y0: float, x1: float, y1: float) -> bytes | None:
    """shapely.clip_by_rect semantics: exact geometric intersection
    with an axis-aligned rectangle (Sutherland-Hodgman for polygon
    rings — the clip window is convex, so the result per ring is a
    single ring; Liang-Barsky for lines; interval test for points).
    Returns None when nothing survives. Like shapely's, polygon output
    validity is best-effort for pathological inputs crossing window
    corners."""
    if g is None:
        return None
    t = g.type
    if t == "Point":
        cx, cy = float(g.coords[0]), float(g.coords[1])
        return W.encode_point(cx, cy) if x0 <= cx <= x1 and y0 <= cy <= y1 else None
    if t == "MultiPoint":
        kept = [
            p.coords[:2] for p in g.coords
            if x0 <= p.coords[0] <= x1 and y0 <= p.coords[1] <= y1
        ]
        if not kept:
            return None
        if len(kept) == 1:
            return W.encode_point(float(kept[0][0]), float(kept[0][1]))
        return W.encode_multipoint(np.array(kept, dtype=np.float64))
    if t in ("LineString", "MultiLineString"):
        parts = [g.coords] if t == "LineString" else [p.coords for p in g.coords]
        clipped: list[np.ndarray] = []
        for c in parts:
            clipped.extend(_clip_segments(np.asarray(c, dtype=np.float64), x0, y0, x1, y1))
        if not clipped:
            return None
        if len(clipped) == 1:
            return W.encode_linestring(clipped[0])
        return W.encode_multilinestring(clipped)
    if t in ("Polygon", "MultiPolygon"):
        groups = [g.coords] if t == "Polygon" else [p.coords for p in g.coords]
        out_polys: list[list[np.ndarray]] = []
        for rings in groups:
            shell = _clip_ring(rings[0], x0, y0, x1, y1)
            if len(shell) == 0 or abs(_ring_area_signed(shell)) == 0.0:
                continue
            poly = [shell]
            for h in rings[1:]:
                hc = _clip_ring(h, x0, y0, x1, y1)
                if len(hc) and abs(_ring_area_signed(hc)) > 0.0:
                    poly.append(hc)
            out_polys.append(poly)
        if not out_polys:
            return None
        if len(out_polys) == 1:
            return W.encode_polygon(out_polys[0])
        return W.encode_multipolygon(out_polys)
    if t == "GeometryCollection":
        parts = [clip_by_rect(p, x0, y0, x1, y1) for p in g.coords]
        kept = [p for p in parts if p is not None]
        return W.encode_collection(kept) if kept else None
    raise ValueError(f"cannot clip geometry type {t}")


# ------------------------------------------------------------ reprojection


def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 -> EPSG:3857 (spherical Mercator, the closed-form
    published projection). Latitudes are clamped to the Mercator
    validity band (|lat| <= 85.051129) like PROJ does."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.06, 85.06)
    x = WEB_MERCATOR_R * np.radians(np.asarray(lon, dtype=np.float64))
    y = WEB_MERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.degrees(np.asarray(x, dtype=np.float64) / WEB_MERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / WEB_MERCATOR_R)) - np.pi / 2.0)
    return lon, lat


def affine_transform(g: "W.Geom | None", matrix) -> bytes | None:
    """shapely.affinity.affine_transform semantics: 2-D 6-parameter
    affine [a, b, d, e, xoff, yoff] -> x' = a x + b y + xoff,
    y' = d x + e y + yoff (translate/scale/rotate/shear all compose
    into this form)."""
    a, b, d, e, xoff, yoff = (float(v) for v in matrix)

    def fn(x, y):
        return a * x + b * y + xoff, d * x + e * y + yoff

    return transform_geom(g, fn)


def transform_geom(g: "W.Geom | None", fn) -> bytes | None:
    """Apply a vectorized (x, y) -> (x', y') transform to every vertex,
    re-encoding as WKB (Z passes through untouched)."""
    if g is None:
        return None

    def walk(geom: "W.Geom") -> "W.Geom":
        t = geom.type
        if t == "Point":
            c = np.asarray(geom.coords, dtype=np.float64)
            x, y = fn(np.array([c[0]]), np.array([c[1]]))
            nc = np.array([x[0], y[0]] + ([c[2]] if geom.has_z else []))
            return W.Geom("Point", nc, geom.has_z)
        if t in ("LineString",):
            c = np.asarray(geom.coords, dtype=np.float64)
            x, y = fn(c[:, 0], c[:, 1])
            nc = np.column_stack([x, y] + ([c[:, 2]] if geom.has_z else []))
            return W.Geom(t, nc, geom.has_z)
        if t == "Polygon":
            rings = []
            for r in geom.coords:
                r = np.asarray(r, dtype=np.float64)
                x, y = fn(r[:, 0], r[:, 1])
                rings.append(np.column_stack([x, y] + ([r[:, 2]] if geom.has_z else [])))
            return W.Geom(t, rings, geom.has_z)
        return W.Geom(t, [walk(p) for p in geom.coords], geom.has_z)

    return W.encode_geom(walk(g))
