"""Deterministic fixture synthesizers (FIXTURES.md F1-F7).

Everything is seeded (seed=42 unless stated), no wall-clock, no external
data. Schemas mirror the reference's canonical test fixtures:

- ``zones``  <- naturalearth_lowres (177 features, 5 attribute fields,
  EPSG:4326; schema asserted at
  /root/reference/pyogrio/tests/test_raw_io.py:43-64)
- ``nulls_matrix`` <- test_gpkg_nulls.gpkg
  (/root/reference/pyogrio/tests/fixtures/README.md:27-93)
- ``list_fields`` <- list_field_values fixtures
  (/root/reference/pyogrio/tests/conftest.py:204-336)
- ``datetimes`` <- datetime/tz fixtures
  (/root/reference/pyogrio/tests/conftest.py:443-530)
- ``geom_zoo``  <- curve/multisurface/line_zm downgrade goldens
  (/root/reference/pyogrio/tests/test_core.py:304-316)
- ``docs`` is the engine's primary interleaved text+media table
  (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.index.grid import cell_of

DEFAULT_RES = 7  # grid resolution shared by docs cell_id and zone covers
CRS = "EPSG:4326"

_TOKENS = (
    "the a scan table row value key part join group agg sort window filter "
    "batch stream spark query data column line order fast slow big small "
    "hash merge customer vector"
).split()


# ------------------------------------------------------------------ F1 docs

def make_docs(n: int = 1000, seed: int = 42, res: int = DEFAULT_RES) -> pd.DataFrame:
    """Interleaved text+media documents with point geometry.

    70% uniform over a continental window, 30% in 5 hotspot clusters
    (drives the skew/salting paths). Span sequences are the per-row
    invariant: (kind, text, media_ref, offset) must survive every stage
    byte-identically.
    """
    rng = np.random.default_rng(seed)
    doc_id = np.array([f"doc{i:012d}" for i in range(n)])

    n_hot = int(n * 0.3)
    n_uni = n - n_hot
    lon_u = rng.uniform(-170.0, 170.0, n_uni)
    lat_u = rng.uniform(-80.0, 80.0, n_uni)
    hot_centers = np.array([(-73.9, 40.7), (2.35, 48.85), (139.7, 35.7), (-0.13, 51.5), (116.4, 39.9)])
    which = rng.integers(0, len(hot_centers), n_hot)
    lon_h = hot_centers[which, 0] + rng.normal(0, 0.8, n_hot)
    lat_h = hot_centers[which, 1] + rng.normal(0, 0.5, n_hot)
    lon = np.concatenate([lon_u, lon_h])
    lat = np.concatenate([lat_u, np.clip(lat_h, -89.9, 89.9)])
    perm = rng.permutation(n)
    lon, lat = lon[perm], lat[perm]

    spans = []
    for i in range(n):
        k = int(rng.integers(1, 9))
        row = []
        off = 0
        for j in range(k):
            kind = "media" if rng.random() < 0.3 else "text"
            if kind == "text":
                nw = int(rng.integers(2, 12))
                txt = " ".join(_TOKENS[t] for t in rng.integers(0, len(_TOKENS), nw))
                row.append({"kind": "text", "text": txt, "media_ref": None, "offset": off})
                off += len(txt) + 1
            else:
                ref = f"media://{doc_id[i]}/{j}"
                row.append({"kind": "media", "text": None, "media_ref": ref, "offset": off})
                off += 64
        spans.append(row)

    geom = W.encode_points(lon, lat)
    return pd.DataFrame(
        {
            "doc_id": doc_id,
            "spans": spans,
            "geometry_wkb": geom,
            "xmin": lon,
            "ymin": lat,
            "xmax": lon,
            "ymax": lat,
            "cell_id": cell_of(lon, lat, res),
        }
    )


DOCS_SPARK_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, "
    "geometry_wkb binary, xmin double, ymin double, xmax double, ymax double, "
    "cell_id long"
)


# ----------------------------------------------------------------- F2 zones

_CONTINENTS = ["Africa", "Asia", "Europe", "North America", "Oceania", "South America", "Antarctica"]


def _iso3(i: int) -> str:
    return chr(65 + (i // 676) % 26) + chr(65 + (i // 26) % 26) + chr(65 + i % 26)


def _jittered_ring(rng, x0, y0, x1, y1, nv: int) -> np.ndarray:
    """Closed CCW ring: nv jittered vertices around the box perimeter."""
    per_side = max(nv // 4, 2)
    xs = np.linspace(x0, x1, per_side + 1)
    ys = np.linspace(y0, y1, per_side + 1)
    pts = []
    pts += [(x, y0) for x in xs[:-1]]
    pts += [(x1, y) for y in ys[:-1]]
    pts += [(x, y1) for x in xs[::-1][:-1]]
    pts += [(x0, y) for y in ys[::-1][:-1]]
    pts = np.array(pts, dtype=np.float64)
    w, h = (x1 - x0), (y1 - y0)
    jit = rng.uniform(-0.12, 0.12, pts.shape)
    jit[:, 0] *= w
    jit[:, 1] *= h
    # keep corners pinned so bboxes stay predictable-ish
    pts = pts + jit
    pts = np.vstack([pts, pts[:1]])
    return pts


def make_zones(n: int = 177, seed: int = 7) -> pd.DataFrame:
    """naturalearth_lowres-equivalent polygon table: n seeded polygons in
    non-overlapping slots, ~8% multipolygons (exercises promote-to-multi,
    /root/reference/pyogrio/geopandas.py:683-740)."""
    rng = np.random.default_rng(seed)
    ncols = 18
    slot_w, slot_h = 360.0 / ncols, 180.0 / int(np.ceil(n / ncols))
    rows = []
    for i in range(n):
        col, row = i % ncols, i // ncols
        sx0 = -180.0 + col * slot_w
        sy0 = -90.0 + row * slot_h
        # polygon occupies a jittered sub-box of its slot
        mx = rng.uniform(0.05, 0.15) * slot_w
        my = rng.uniform(0.05, 0.15) * slot_h
        x0, y0 = sx0 + mx, sy0 + my
        x1, y1 = sx0 + slot_w - mx, sy0 + slot_h - my
        nv = int(rng.integers(8, 40))
        if rng.random() < 0.08:
            xm = (x0 + x1) / 2
            ring_a = _jittered_ring(rng, x0, y0, xm - 0.02 * slot_w, y1, max(nv // 2, 8))
            ring_b = _jittered_ring(rng, xm + 0.02 * slot_w, y0, x1, y1, max(nv // 2, 8))
            geom = W.encode_multipolygon([[ring_a], [ring_b]])
        else:
            ring = _jittered_ring(rng, x0, y0, x1, y1, nv)
            geom = W.encode_polygon([ring])
        bx0, by0, bx1, by1 = W.bounds(geom)
        rows.append(
            {
                "fid": i,
                "pop_est": float(rng.integers(10_000, 1_400_000_000)),
                "continent": _CONTINENTS[int(rng.integers(0, len(_CONTINENTS)))],
                "name": f"Zone {_iso3(i)}",
                "iso_a3": _iso3(i),
                "gdp_md_est": float(rng.integers(100, 25_000_000)),
                "geometry_wkb": geom,
                "xmin": bx0,
                "ymin": by0,
                "xmax": bx1,
                "ymax": by1,
            }
        )
    return pd.DataFrame(rows)


ZONES_SPARK_SCHEMA = (
    "fid long, pop_est double, continent string, name string, iso_a3 string, "
    "gdp_md_est double, geometry_wkb binary, xmin double, ymin double, "
    "xmax double, ymax double"
)


# ------------------------------------------------------------ F7 knn/zonal

def make_knn_probes(n: int = 50, seed: int = 11, res: int = DEFAULT_RES) -> pd.DataFrame:
    """Probe points; half are placed right at cell borders so correct kNN
    forces ring expansion across cell boundaries."""
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-170, 170, n)
    lat = rng.uniform(-80, 80, n)
    nb = n // 2
    cw = 360.0 / (1 << res)
    lon[:nb] = np.floor(lon[:nb] / cw) * cw + cw * 0.001  # hug the west cell edge
    return pd.DataFrame(
        {
            "probe_id": [f"probe{i:06d}" for i in range(n)],
            "geometry_wkb": W.encode_points(lon, lat),
            "lon": lon,
            "lat": lat,
            "cell_id": cell_of(lon, lat, res),
        }
    )


def make_zonal_raster(tile_deg: float = 1.0, seed: int = 13) -> pd.DataFrame:
    """Deterministic synthetic raster grid covering the globe; value is a
    smooth function + seeded noise (Raptor-style raster side, PAPERS.md:6)."""
    xs = np.arange(int(-180 / tile_deg), int(180 / tile_deg))
    ys = np.arange(int(-90 / tile_deg), int(90 / tile_deg))
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    gx, gy = gx.ravel(), gy.ravel()
    rng = np.random.default_rng(seed)
    val = np.sin(gx * 0.1) * 10 + np.cos(gy * 0.07) * 5 + rng.normal(0, 1, gx.shape[0])
    return pd.DataFrame({"tile_x": gx.astype(np.int32), "tile_y": gy.astype(np.int32), "value": val})


# ---------------------------------------------------- F3/F4/F5/F6 matrices

def make_nulls_matrix() -> pd.DataFrame:
    """3 value rows + 1 all-null row across the dtype matrix
    (test_gpkg_nulls layout, /root/reference/pyogrio/tests/fixtures/README.md:27-93)."""
    rows = {
        "col_bool": [True, False, True, None],
        "col_int8": [-128, 0, 127, None],
        "col_int16": [-32768, 0, 32767, None],
        "col_int32": [-(2**31), 0, 2**31 - 1, None],
        "col_int64": [-(2**63), 0, 2**63 - 1, None],
        "col_uint8": [0, 127, 255, None],
        "col_uint16": [0, 300, 65535, None],
        "col_uint32": [0, 70000, 2**32 - 1, None],
        "col_uint64": [0, 2**40, 2**63 - 1, None],
        "col_float32": [-1.5, 0.0, 1.5, None],
        "col_float64": [-1e300, 0.0, 1e300, None],
    }
    df = pd.DataFrame(rows, dtype=object)
    df["geometry_wkb"] = list(W.encode_points(np.arange(4, dtype=float), np.arange(4, dtype=float)))
    return df


def make_list_fields() -> pd.DataFrame:
    """Populated / empty / null lists and null elements
    (/root/reference/pyogrio/tests/conftest.py:204-336)."""
    return pd.DataFrame(
        {
            "int": [0, 1, 2, 3, 4],
            "list_int": [[0, 1], [2, 3], [4, 5], [], None],
            "list_double": [[0.0, 1.0], [2.0, 3.0], [4.0, 5.0], [], None],
            "list_string": [["a", "b"], ["", "d"], ["e"], [], None],
            "list_int_with_null": [[0, None], [2, 3], None, [], [7]],
            "list_string_with_null": [["a", None], ["c"], None, [], [""]],
            "geometry_wkb": list(W.encode_points(np.arange(5, dtype=float), np.arange(5, dtype=float))),
        }
    )


def make_datetimes() -> pd.DataFrame:
    """Datetime/tz matrix incl. ms precision and pre-epoch strings
    (/root/reference/pyogrio/tests/conftest.py:443-530; ms rule
    /root/reference/pyogrio/geopandas.py:126-133)."""
    return pd.DataFrame(
        {
            "dt_naive": pd.to_datetime(
                ["2020-01-01T09:00:00.123", "2021-06-15T12:30:45.000", "1999-12-31T23:59:59.999"]
            ),
            "dt_tz_iso": [
                "2020-01-01T09:00:00.123-05:00",
                "2021-06-15T12:30:45.000+02:00",
                "1999-12-31T23:59:59.999+00:00",
            ],
            "dt_utc": pd.to_datetime(
                ["2020-01-01T14:00:00.123Z", "2021-06-15T10:30:45.000Z", "1999-12-31T23:59:59.999Z"]
            ),
            "dt_date": pd.to_datetime(["2020-01-01", "2021-06-15", "1999-12-31"]).date,
            "dt_long_ago": ["1670-01-01T09:00:00", "1670-06-01T00:00:00", "1670-12-31T23:59:59"],
            "geometry_wkb": list(W.encode_points(np.arange(3, dtype=float), np.arange(3, dtype=float))),
        }
    )


def make_geom_zoo() -> pd.DataFrame:
    """Geometry-type normalization cases with golden expected types
    (downgrade goldens /root/reference/pyogrio/tests/test_core.py:304-316;
    curves arrive pre-linearized because the reference linearizes at scan,
    /root/reference/pyogrio/_io.pyx:258,1016-1017)."""
    sq = np.array([(0.0, 0.0), (1, 0), (1, 1), (0, 1), (0, 0)])
    line = np.array([(0.0, 0.0), (1, 1), (2, 0)])
    line_z = np.array([(0.0, 0.0, 5.0), (1, 1, 6.0), (2, 0, 7.0)])
    # a curve linearized into a dense polyline (what OGR_G_GetLinearGeometry produces)
    t = np.linspace(0, np.pi, 17)
    arc = np.stack([np.cos(t), np.sin(t)], axis=1)
    cases = [
        ("point", W.encode_point(1.0, 2.0), "Point"),
        ("linestring", W.encode_linestring(line), "LineString"),
        ("polygon", W.encode_polygon([sq]), "Polygon"),
        ("multipoint", W.encode_multipoint(line), "MultiPoint"),
        ("multilinestring", W.encode_multilinestring([line, line + 3]), "MultiLineString"),
        ("multipolygon", W.encode_multipolygon([[sq], [sq + 5]]), "MultiPolygon"),
        (
            "geometrycollection",
            W.encode_collection([W.encode_point(0.0, 0.0), W.encode_linestring(line)]),
            "GeometryCollection",
        ),
        ("linestring_z", W.encode_linestring(line_z), "LineString Z"),
        ("curve_linearized", W.encode_linestring(arc), "LineString"),
        ("curvepolygon_linearized", W.encode_polygon([np.vstack([arc, arc[:1]])]), "Polygon"),
        (
            "multisurface_linearized",
            W.encode_multipolygon([[np.vstack([arc, arc[:1]])]]),
            "MultiPolygon",
        ),
        ("invalid_unclosed_ring", W.encode_polygon([sq[:-1]]), "Polygon"),
        ("empty", W.encode_multipolygon([]), "MultiPolygon"),
        ("null", None, None),
    ]
    return pd.DataFrame(cases, columns=["case", "geometry_wkb", "expected_type"])
