"""FlatGeobuf source + sink, written from the public spec
(https://flatgeobuf.org, https://github.com/flatgeobuf/flatgeobuf —
Header.fbs / Feature.fbs), on the in-repo minimal FlatBuffers codec.

Reference parity anchor: pyogrio treats ``.fgb`` as a first-class
driver — /root/reference/pyogrio/tests/conftest.py:26-41 regenerates
every fixture into FlatGeobuf and runs the full read/write matrix over
it; docs/source/supported_formats.md lists it in the supported-formats
table. This engine path gives the same surface without GDAL.

File layout: 8 magic bytes ``fgb\\x03fgb\\x01``, a size-prefixed Header
flatbuffer, an optional packed Hilbert R-tree index, then size-prefixed
Feature flatbuffers. The writer emits ``index_node_size=0`` (no index —
features keep input order, which is what byte-fidelity round trips
want); the reader skips any index via the packed-R-tree size formula.

Geometry: FlatGeobuf's type enum equals the WKB base-type codes, and
coordinates live in a flat ``xy`` vector with ring/part ``ends``
(MultiPolygon/GeometryCollection nest via ``parts``). Conversion to and
from the engine's WKB ``Geom`` is loss-free for 2-D and Z geometries.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from pyogrio_spark.geometry import wkb as W
from pyogrio_spark.io.flatbuf import Builder, Table

MAGIC = b"fgb\x03fgb\x01"

# GeometryType enum — identical to WKB base-type codes (public spec)
GEOM_NAME_TO_CODE = {
    "Unknown": 0, "Point": 1, "LineString": 2, "Polygon": 3, "MultiPoint": 4,
    "MultiLineString": 5, "MultiPolygon": 6, "GeometryCollection": 7,
}
GEOM_CODE_TO_NAME = {v: k for k, v in GEOM_NAME_TO_CODE.items()}

# ColumnType enum (Header.fbs declaration order)
COL_BYTE, COL_UBYTE, COL_BOOL, COL_SHORT, COL_USHORT, COL_INT, COL_UINT = range(7)
COL_LONG, COL_ULONG, COL_FLOAT, COL_DOUBLE, COL_STRING, COL_JSON = range(7, 13)
COL_DATETIME, COL_BINARY = 13, 14

_SCALAR_COL_FMT = {
    COL_BYTE: "<b", COL_UBYTE: "<B", COL_BOOL: "<B", COL_SHORT: "<h",
    COL_USHORT: "<H", COL_INT: "<i", COL_UINT: "<I", COL_LONG: "<q",
    COL_ULONG: "<Q", COL_FLOAT: "<f", COL_DOUBLE: "<d",
}


def packed_rtree_size(num_items: int, node_size: int) -> int:
    """Byte size of the static packed Hilbert R-tree (40-byte nodes:
    4 doubles + uint64 feature offset)."""
    node_size = max(2, min(int(node_size), 65535))
    n = num_items
    num_nodes = n
    while n != 1:
        n = (n + node_size - 1) // node_size
        num_nodes += n
    return num_nodes * 40


_HILBERT_ORDER = 16  # spec: centers quantized to [0, 2^16) in the envelope


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int = _HILBERT_ORDER) -> np.ndarray:
    """Vectorized Hilbert curve index of quantized (x, y) — the classic
    xy->d bit loop, numpy over all points at once."""
    x = x.astype(np.uint64).copy()
    y = y.astype(np.uint64).copy()
    d = np.zeros_like(x)
    s = np.uint64(1) << np.uint64(order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        flip = ry == 0
        swapflip = flip & (rx == 1)
        x[swapflip] = s - np.uint64(1) - x[swapflip]
        y[swapflip] = s - np.uint64(1) - y[swapflip]
        xt = x[flip].copy()
        x[flip] = y[flip]
        y[flip] = xt
        s >>= np.uint64(1)
    return d


def hilbert_order(bboxes: np.ndarray) -> np.ndarray:
    """Permutation sorting features by the Hilbert index of their bbox
    center within the dataset envelope (the spec's sort for indexed
    files)."""
    minx, miny = bboxes[:, 0].min(), bboxes[:, 1].min()
    maxx, maxy = bboxes[:, 2].max(), bboxes[:, 3].max()
    w = (maxx - minx) or 1.0
    h = (maxy - miny) or 1.0
    hmax = (1 << _HILBERT_ORDER) - 1
    cx = np.floor(hmax * (((bboxes[:, 0] + bboxes[:, 2]) / 2 - minx) / w))
    cy = np.floor(hmax * (((bboxes[:, 1] + bboxes[:, 3]) / 2 - miny) / h))
    return np.argsort(hilbert_d(cx, cy), kind="stable")


def build_packed_rtree(bboxes: np.ndarray, feature_offsets: np.ndarray, node_size: int = 16) -> bytes:
    """Static packed Hilbert R-tree bytes for features ALREADY in
    Hilbert order. Levels stored root-first, leaves last (the layout
    ``read_flatgeobuf_pdf`` skips and the distributed reader's leaf
    slice assumes); leaf node offsets are byte offsets into the feature
    section, internal node offsets index-relative offsets of the first
    child node."""
    node_size = max(2, min(int(node_size), 65535))
    n = len(bboxes)
    # level sizes bottom-up: [leaves, ..., root]
    sizes = [n]
    m = n
    while m != 1:
        m = (m + node_size - 1) // node_size
        sizes.append(m)
    levels: list[np.ndarray] = []  # bottom-up list of (k, 5) float/record arrays
    leaf = np.empty((n, 5), dtype=object)
    leaf[:, :4] = bboxes[:, :4]
    leaf[:, 4] = feature_offsets
    levels.append(leaf)
    for li in range(1, len(sizes)):
        child = levels[-1]
        k = sizes[li]
        node = np.empty((k, 5), dtype=object)
        for i in range(k):
            grp = child[i * node_size : (i + 1) * node_size]
            node[i, 0] = min(g[0] for g in grp)
            node[i, 1] = min(g[1] for g in grp)
            node[i, 2] = max(g[2] for g in grp)
            node[i, 3] = max(g[3] for g in grp)
            node[i, 4] = i * node_size  # child index within its level, fixed below
        levels.append(node)
    # absolute node offsets: levels written top-down (root first)
    out = bytearray()
    top_down = levels[::-1]
    # start offset (in bytes) of each written level, top-down
    starts = []
    pos = 0
    for lvl in top_down:
        starts.append(pos)
        pos += len(lvl) * 40
    for li, lvl in enumerate(top_down):
        is_leaf = li == len(top_down) - 1
        for node in lvl:
            off = int(node[4]) if is_leaf else starts[li + 1] + int(node[4]) * 40
            out += struct.pack("<4dQ", float(node[0]), float(node[1]), float(node[2]), float(node[3]), off)
    return bytes(out)


# ------------------------------------------------------------ geometry


def _flat_xy(coords: np.ndarray) -> tuple[bytes, bytes | None, int]:
    """(n, 2|3) array -> (packed xy bytes, packed z bytes | None, n)."""
    a = np.asarray(coords, dtype="<f8")
    if a.ndim == 1:
        a = a.reshape(1, -1)
    xy = np.ascontiguousarray(a[:, :2]).tobytes()
    z = np.ascontiguousarray(a[:, 2]).tobytes() if a.shape[1] > 2 else None
    return xy, z, len(a)


def _build_geometry(b: Builder, g: "W.Geom", write_type: bool = True) -> int:
    """Geom -> FlatGeobuf Geometry table (slots: ends=0 xy=1 z=2 m=3
    t=4 tm=5 type=6 parts=7)."""
    code = GEOM_NAME_TO_CODE[g.type]
    ends_off = xy_off = z_off = parts_off = None
    if g.type == "Point":
        xy, z, _ = _flat_xy(g.coords)
        xy_off = b.create_scalar_vector(xy, 2, 8)
        if z:
            z_off = b.create_scalar_vector(z, 1, 8)
    elif g.type == "LineString":
        xy, z, n = _flat_xy(g.coords)
        xy_off = b.create_scalar_vector(xy, 2 * n, 8)
        if z:
            z_off = b.create_scalar_vector(z, n, 8)
    elif g.type == "Polygon":
        rings = [np.asarray(r, dtype="<f8") for r in g.coords]
        cat = np.concatenate(rings, axis=0)
        xy, z, n = _flat_xy(cat)
        xy_off = b.create_scalar_vector(xy, 2 * n, 8)
        if z:
            z_off = b.create_scalar_vector(z, n, 8)
        if len(rings) > 1:
            ends = np.cumsum([len(r) for r in rings]).astype("<u4")
            ends_off = b.create_scalar_vector(ends.tobytes(), len(ends), 4)
    elif g.type == "MultiPoint":
        pts = np.array([p.coords for p in g.coords], dtype="<f8")
        xy, z, n = _flat_xy(pts)
        xy_off = b.create_scalar_vector(xy, 2 * n, 8)
        if z:
            z_off = b.create_scalar_vector(z, n, 8)
    elif g.type == "MultiLineString":
        lines = [np.asarray(p.coords, dtype="<f8") for p in g.coords]
        cat = np.concatenate(lines, axis=0)
        xy, z, n = _flat_xy(cat)
        xy_off = b.create_scalar_vector(xy, 2 * n, 8)
        if z:
            z_off = b.create_scalar_vector(z, n, 8)
        if len(lines) > 1:
            ends = np.cumsum([len(p) for p in lines]).astype("<u4")
            ends_off = b.create_scalar_vector(ends.tobytes(), len(ends), 4)
    elif g.type in ("MultiPolygon", "GeometryCollection"):
        parts = [_build_geometry(b, p, write_type=True) for p in g.coords]
        parts_off = b.create_offset_vector(parts)
    else:  # pragma: no cover
        raise ValueError(f"cannot write geometry type {g.type} to FlatGeobuf")
    b.start_table()
    b.add_offset(0, ends_off)
    b.add_offset(1, xy_off)
    b.add_offset(2, z_off)
    if write_type:
        b.add_scalar(6, "<B", code, 0)
    b.add_offset(7, parts_off)
    return b.end_table()


def _read_coords(t: Table) -> np.ndarray:
    start, n2 = t.vector(1)  # xy
    xy = np.frombuffer(t.buf, dtype="<f8", count=n2, offset=start).reshape(-1, 2)
    zs, nz = t.vector(2)
    if nz:
        z = np.frombuffer(t.buf, dtype="<f8", count=nz, offset=zs)
        return np.column_stack([xy, z])
    return np.array(xy)  # copy out of the file buffer


def _split_ends(t: Table, coords: np.ndarray) -> list[np.ndarray]:
    ends = t.scalar_vector(0, "I")
    if not ends:
        return [coords]
    out, prev = [], 0
    for e in ends:
        out.append(coords[prev:e])
        prev = e
    return out


def _parse_geometry(t: Table, type_code: int) -> "W.Geom":
    code = t.scalar(6, "<B", 0) or type_code
    name = GEOM_CODE_TO_NAME.get(code)
    if name == "Point":
        c = _read_coords(t)
        return W.Geom("Point", c[0], c.shape[1] > 2)
    if name == "LineString":
        c = _read_coords(t)
        return W.Geom("LineString", c, c.shape[1] > 2)
    if name == "Polygon":
        c = _read_coords(t)
        return W.Geom("Polygon", _split_ends(t, c), c.shape[1] > 2)
    if name == "MultiPoint":
        c = _read_coords(t)
        has_z = c.shape[1] > 2
        return W.Geom("MultiPoint", [W.Geom("Point", p, has_z) for p in c], has_z)
    if name == "MultiLineString":
        c = _read_coords(t)
        has_z = c.shape[1] > 2
        parts = [W.Geom("LineString", p, has_z) for p in _split_ends(t, c)]
        return W.Geom("MultiLineString", parts, has_z)
    if name == "MultiPolygon":
        parts = t.table_vector(7)
        if parts:
            polys = [_parse_geometry(p, GEOM_NAME_TO_CODE["Polygon"]) for p in parts]
        else:  # single-polygon shorthand some writers emit
            c = _read_coords(t)
            polys = [W.Geom("Polygon", _split_ends(t, c), c.shape[1] > 2)]
        return W.Geom("MultiPolygon", polys, any(p.has_z for p in polys))
    if name == "GeometryCollection":
        parts = [_parse_geometry(p, 0) for p in t.table_vector(7)]
        return W.Geom("GeometryCollection", parts, any(p.has_z for p in parts))
    raise ValueError(f"unsupported FlatGeobuf geometry type code {code}")


# ----------------------------------------------------------- properties


def _column_spec(pdf: pd.DataFrame, cols: list[str]) -> list[tuple[str, int]]:
    spec = []
    for c in cols:
        dt = pdf[c].dtype
        name = str(dt)
        if dt == np.int64 or name == "Int64":
            spec.append((c, COL_LONG))
        elif dt == np.int32 or name == "Int32":
            spec.append((c, COL_INT))
        elif dt == np.float64 or name == "Float64":
            spec.append((c, COL_DOUBLE))
        elif dt == np.float32 or name == "Float32":
            spec.append((c, COL_FLOAT))
        elif dt == bool or name == "boolean":
            spec.append((c, COL_BOOL))
        elif name.startswith("datetime64"):
            spec.append((c, COL_DATETIME))
        else:
            # object column: type the first non-null sample (nulls render
            # as omitted slots either way). bool before int: Python bool
            # is an int subclass.
            sample = next((v for v in pdf[c] if v is not None and not pd.isna(v)), None)
            if isinstance(sample, (bytes, bytearray)):
                spec.append((c, COL_BINARY))
            elif isinstance(sample, (bool, np.bool_)):
                spec.append((c, COL_BOOL))
            elif isinstance(sample, (int, np.integer)):
                spec.append((c, COL_LONG))
            elif isinstance(sample, (float, np.floating)):
                spec.append((c, COL_DOUBLE))
            else:
                spec.append((c, COL_STRING))
    return spec


def _encode_properties(row, spec: list[tuple[str, int]]) -> bytes:
    out = bytearray()
    for i, (name, ctype) in enumerate(spec):
        v = row[name]
        if v is None or (np.isscalar(v) and pd.isna(v)):
            continue  # nullable column omitted = null
        out += struct.pack("<H", i)
        if ctype in _SCALAR_COL_FMT:
            out += struct.pack(_SCALAR_COL_FMT[ctype], bool(v) if ctype == COL_BOOL else v)
        elif ctype == COL_BINARY:
            bv = bytes(v)
            out += struct.pack("<I", len(bv)) + bv
        else:  # String / Json / DateTime — length-prefixed UTF-8
            s = pd.Timestamp(v).isoformat() if ctype == COL_DATETIME else str(v)
            bv = s.encode("utf-8")
            out += struct.pack("<I", len(bv)) + bv
    return bytes(out)


def _decode_properties(buf, spec: list[tuple[str, int]]) -> dict:
    vals: dict = {}
    off, end = 0, len(buf)
    while off + 2 <= end:
        (i,) = struct.unpack_from("<H", buf, off)
        off += 2
        name, ctype = spec[i]
        if ctype in _SCALAR_COL_FMT:
            fmt = _SCALAR_COL_FMT[ctype]
            (v,) = struct.unpack_from(fmt, buf, off)
            off += struct.calcsize(fmt)
            vals[name] = bool(v) if ctype == COL_BOOL else v
        else:
            (ln,) = struct.unpack_from("<I", buf, off)
            off += 4
            raw = bytes(buf[off : off + ln])
            off += ln
            vals[name] = raw if ctype == COL_BINARY else raw.decode("utf-8")
    return vals


# ----------------------------------------------------------------- write


def _build_header(
    spec: list[tuple[str, int]],
    layer_code: int,
    has_z: bool,
    env: list[float],
    count: int,
    layer_name: str,
    crs,
    index_node_size: int,
) -> bytes:
    """Size-prefixed Header flatbuffer (slots: name=0 envelope=1
    geometry_type=2 has_z=3 columns=7 features_count=8
    index_node_size=9 crs=10) — shared by the driver-side and
    distributed sinks."""
    hb = Builder()
    col_offs = []
    for name, ctype in spec:
        n_off = hb.create_string(name)
        hb.start_table()
        hb.add_offset(0, n_off)
        hb.add_scalar(1, "<B", ctype, 0)
        # width/precision/scale keep their -1 defaults; nullable default true
        col_offs.append(hb.end_table())
    cols_off = hb.create_offset_vector(col_offs) if col_offs else None
    # Crs table (Header.fbs slots: org=0 code=1 name=2 description=3
    # wkt=4): persist the caller's CRS — org/code when it identifies to
    # an EPSG code, plus the WKT when one is available/derivable
    crs_off = None
    if crs is not None:
        from pyogrio_spark.crs import crs_to_epsg, crs_to_wkt

        code = crs_to_epsg(crs)
        wkt = str(crs) if isinstance(crs, str) and "[" in crs else (
            crs_to_wkt(code) if code is not None else None
        )
        wkt_off = hb.create_string(wkt) if wkt else None
        org_off = hb.create_string("EPSG") if code is not None else None
        hb.start_table()
        hb.add_offset(0, org_off)
        if code is not None:
            hb.add_scalar(1, "<i", int(code), 0)
        hb.add_offset(4, wkt_off)
        crs_off = hb.end_table()
    name_off = hb.create_string(layer_name)
    env_off = hb.create_scalar_vector(struct.pack("<4d", *env), 4, 8)
    hb.start_table()
    hb.add_offset(0, name_off)
    hb.add_offset(1, env_off)
    hb.add_scalar(2, "<B", layer_code, 0)
    hb.add_scalar(3, "<B", 1 if has_z else 0, 0)
    hb.add_offset(7, cols_off)
    hb.add_scalar(8, "<Q", int(count), 0)
    # header default for slot 9 is 16, so 0 must be written explicitly
    hb.add_scalar(9, "<H", max(0, int(index_node_size)), 16)
    hb.add_offset(10, crs_off)
    return hb.finish(hb.end_table(), size_prefixed=True)


def _encode_feature(g, row, spec: list[tuple[str, int]]) -> bytes:
    """One (Geom | None, property dict) -> size-prefixed Feature
    flatbuffer — shared by the driver-side and distributed sinks."""
    fb = Builder()
    geom_off = None if g is None else _build_geometry(fb, g)
    props = _encode_properties(row, spec)
    props_off = fb.create_scalar_vector(props, len(props), 1) if props else None
    fb.start_table()
    fb.add_offset(0, geom_off)
    fb.add_offset(1, props_off)
    return fb.finish(fb.end_table(), size_prefixed=True)


def write_flatgeobuf(
    pdf: pd.DataFrame,
    path: str,
    geom_col: str = "geometry_wkb",
    layer_name: str | None = None,
    crs=None,
    crs_wkt: str | None = None,
    index_node_size: int = 0,
) -> None:
    """Write a FlatGeobuf file from a frame with a WKB geometry column.

    ``index_node_size=0`` (default): no spatial index — features keep
    their input order and round-trip byte-identically through
    ``read_flatgeobuf_pdf``. ``index_node_size>0`` (spec default 16):
    writes the static packed Hilbert R-tree; features are re-sorted
    into Hilbert order (the spec's contract for indexed files) and the
    leaf nodes carry their byte offsets — which the distributed reader
    uses for byte-range partitioning. Indexing requires non-null
    geometries (a bbox per feature)."""
    # like every other format sink here, a ``fid`` column is the
    # engine's ROW-ID convention, not an attribute — drop it on write
    # (the reader regenerates sequential fids), matching the reference
    # where FIDs are driver-assigned, never stored fields
    attr_cols = [c for c in pdf.columns if c not in (geom_col, "fid")]
    spec = _column_spec(pdf, attr_cols)
    geoms = [None if b is None else W.parse_wkb(bytes(b)) for b in pdf[geom_col]]

    types = {g.type for g in geoms if g is not None}
    if len(types) == 1:
        layer_code = GEOM_NAME_TO_CODE[next(iter(types))]
    elif types <= {"Polygon", "MultiPolygon"} and types:
        layer_code = GEOM_NAME_TO_CODE["MultiPolygon"]
    else:
        layer_code = 0  # Unknown: per-feature geometry types carry it
    has_z = any(g.has_z for g in geoms if g is not None)

    env = [np.inf, np.inf, -np.inf, -np.inf]
    for g in geoms:
        if g is None:
            continue
        x0, y0, x1, y1 = W._geom_bounds(g)
        env = [min(env[0], x0), min(env[1], y0), max(env[2], x1), max(env[3], y1)]
    if not np.isfinite(env[0]):
        env = [0.0, 0.0, 0.0, 0.0]

    if crs is None and crs_wkt is not None:
        crs = crs_wkt  # back-compat alias
    header = _build_header(
        spec, layer_code, has_z, env, len(pdf),
        layer_name or os.path.splitext(os.path.basename(path))[0],
        crs, index_node_size,
    )

    rows = pdf[attr_cols].to_dict("records") if attr_cols else [{}] * len(pdf)

    def frame(g, row) -> bytes:
        return _encode_feature(g, row, spec)

    index_bytes = b""
    if index_node_size > 0 and len(pdf) > 0:
        if any(g is None for g in geoms):
            raise ValueError("index_node_size > 0 requires non-null geometries")
        bboxes = np.array([W._geom_bounds(g) for g in geoms], dtype=np.float64)
        order = hilbert_order(bboxes)
        geoms = [geoms[i] for i in order]
        rows = [rows[i] for i in order]
        bboxes = bboxes[order]
        frames = [frame(g, row) for g, row in zip(geoms, rows)]
        offsets = np.cumsum([0] + [len(fr) for fr in frames[:-1]]).astype(np.uint64)
        index_bytes = build_packed_rtree(bboxes, offsets, index_node_size)
    else:
        frames = [frame(g, row) for g, row in zip(geoms, rows)]

    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(header)
        f.write(index_bytes)
        for fr in frames:
            f.write(fr)


def _spec_from_spark_schema(dtypes: list[tuple[str, str]]) -> list[tuple[str, int]]:
    """Spark (name, type) pairs -> FGB column spec (inverse of
    _spark_type; both sinks of one frame agree on typing)."""
    to_col = {
        "tinyint": COL_BYTE, "smallint": COL_SHORT, "int": COL_INT,
        "bigint": COL_LONG, "float": COL_FLOAT, "double": COL_DOUBLE,
        "boolean": COL_BOOL, "binary": COL_BINARY, "string": COL_STRING,
    }
    spec = []
    for name, t in dtypes:
        if t.startswith("timestamp") or t == "date":
            spec.append((name, COL_DATETIME))
        else:
            spec.append((name, to_col.get(t, COL_STRING)))
    return spec


def write_flatgeobuf_distributed(
    df,
    path: str,
    geom_col: str = "geometry_wkb",
    layer_name: str | None = None,
    crs=None,
    index_node_size: int = 0,
) -> None:
    """Distributed FlatGeobuf sink: the EXPENSIVE work — WKB parse and
    FlatBuffers feature encoding — runs once per partition inside
    mapInPandas, each task writing its encoded feature section to a
    part file; the driver then writes the header (feature count,
    envelope, geometry type aggregated from per-part metadata) and
    streams the parts into the single output file in partition order.
    The driver's share of the job is sequential byte copying only — the
    irreducible cost of a single-file target — so encode throughput
    scales with executors (the write-side mirror of the distributed
    byte-range scans; parts dir must be on a filesystem shared with
    executors, the same contract as those scans).

    Layout: index_node_size=0 (default) keeps partition order, same as
    the driver-side writer's default, and round-trips byte-identically
    through both readers. ``index_node_size>0`` writes the packed
    Hilbert R-tree: features are GLOBALLY sorted by the Hilbert key of
    their bbox center (computed vectorized per batch, one Spark range
    sort — the distributed equivalent of the driver writer's argsort),
    each task writes its feature section AND a packed leaf-node side
    file (40 bytes/feature), and the driver assembles the tree from
    the streamed leaf level (upper levels are built in memory: 40
    bytes per feature on the driver — fine to ~10^8 features, stated
    bound). Indexing requires non-null geometries, like the
    driver-side writer."""
    import shutil
    import uuid

    from pyspark.sql import functions as F

    cols = [c for c in df.columns if c not in (geom_col, "fid")]
    spec = _spec_from_spark_schema([(c, t) for c, t in df.dtypes if c not in (geom_col, "fid")])

    if index_node_size > 0:
        # pass 1: dataset envelope (needed to quantize Hilbert centers)
        def _bounds(pdfs):
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                bs = W.bounds_many([None if b is None else bytes(b) for b in pdf[geom_col]])
                if np.isnan(bs).any():
                    raise ValueError("index_node_size > 0 requires non-null geometries")
                yield pd.DataFrame(
                    [(float(bs[:, 0].min()), float(bs[:, 1].min()),
                      float(bs[:, 2].max()), float(bs[:, 3].max()))],
                    columns=["minx", "miny", "maxx", "maxy"],
                )

        env_row = (
            df.select(geom_col).mapInPandas(_bounds, schema="minx double, miny double, maxx double, maxy double")
            .agg(F.min("minx"), F.min("miny"), F.max("maxx"), F.max("maxy"))
            .first()
        )
        e0, e1, e2, e3 = (float(v) for v in env_row)
        w = (e2 - e0) or 1.0
        h = (e3 - e1) or 1.0
        hmax = (1 << _HILBERT_ORDER) - 1

        def _hkey(pdfs):
            for pdf in pdfs:
                bs = W.bounds_many([bytes(b) for b in pdf[geom_col]])
                cx = np.floor(hmax * (((bs[:, 0] + bs[:, 2]) / 2 - e0) / w))
                cy = np.floor(hmax * (((bs[:, 1] + bs[:, 3]) / 2 - e1) / h))
                out = pdf.copy()
                out["_hkey"] = hilbert_d(cx, cy).astype(np.int64)
                yield out

        hschema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + ", `_hkey` bigint"
        df = df.mapInPandas(_hkey, schema=hschema).orderBy("_hkey").drop("_hkey")

    parts_dir = f"{path}.parts-{uuid.uuid4().hex[:8]}"
    os.makedirs(parts_dir, exist_ok=True)

    meta_schema = (
        "pid int, part string, n long, minx double, miny double, "
        "maxx double, maxy double, gtypes string, has_z boolean"
    )
    write_leaves = index_node_size > 0

    def encode(pdfs):
        import pandas as _pd

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        part = os.path.join(parts_dir, f"part-{pid:05d}")
        n = 0
        env = [np.inf, np.inf, -np.inf, -np.inf]
        gtypes: set[str] = set()
        has_z = False
        leaf = open(part + ".leaf", "wb") if write_leaves else None
        try:
            with open(part, "wb") as f:
                pos = 0
                for pdf in pdfs:
                    rows = pdf[cols].to_dict("records") if cols else [{}] * len(pdf)
                    for g_wkb, row in zip(pdf[geom_col], rows):
                        g = None if g_wkb is None else W.parse_wkb(bytes(g_wkb))
                        if g is not None:
                            gtypes.add(g.type)
                            has_z = has_z or g.has_z
                            x0, y0, x1, y1 = W._geom_bounds(g)
                            env = [min(env[0], x0), min(env[1], y0),
                                   max(env[2], x1), max(env[3], y1)]
                        elif write_leaves:
                            raise ValueError("index_node_size > 0 requires non-null geometries")
                        frame_bytes = _encode_feature(g, row, spec)
                        f.write(frame_bytes)
                        if leaf is not None:
                            # part-relative offset; driver shifts by the
                            # part's base when assembling the leaf level
                            leaf.write(struct.pack("<4dQ", x0, y0, x1, y1, pos))
                        pos += len(frame_bytes)
                        n += 1
        finally:
            if leaf is not None:
                leaf.close()
        yield _pd.DataFrame(
            [(pid, part, n, env[0], env[1], env[2], env[3],
              ",".join(sorted(gtypes)), has_z)],
            columns=["pid", "part", "n", "minx", "miny", "maxx", "maxy",
                     "gtypes", "has_z"],
        )

    meta = df.mapInPandas(encode, schema=meta_schema).collect()
    try:
        meta = sorted(meta, key=lambda r: r["pid"])
        total = sum(r["n"] for r in meta)
        env = [
            min((r["minx"] for r in meta if r["n"]), default=np.inf),
            min((r["miny"] for r in meta if r["n"]), default=np.inf),
            max((r["maxx"] for r in meta if r["n"]), default=-np.inf),
            max((r["maxy"] for r in meta if r["n"]), default=-np.inf),
        ]
        if not np.isfinite(env[0]):
            env = [0.0, 0.0, 0.0, 0.0]
        types = set()
        for r in meta:
            types.update(t for t in r["gtypes"].split(",") if t)
        if len(types) == 1:
            layer_code = GEOM_NAME_TO_CODE[next(iter(types))]
        elif types <= {"Polygon", "MultiPolygon"} and types:
            layer_code = GEOM_NAME_TO_CODE["MultiPolygon"]
        else:
            layer_code = 0
        has_z = any(r["has_z"] for r in meta)
        index_bytes = b""
        if write_leaves and total > 0:
            # leaf level: concat part leaf files, shifting each part's
            # relative offsets by the cumulative byte base of the parts
            # before it (parts are range-partitioned by Hilbert key, so
            # pid order IS global Hilbert order)
            recs = []
            base = 0
            for r in meta:
                raw = np.fromfile(r["part"] + ".leaf", dtype=np.uint8).reshape(-1, 40)
                if len(raw):
                    boxes = raw[:, :32].copy().view("<f8").reshape(-1, 4)
                    offs = raw[:, 32:].copy().view("<u8").ravel().astype(np.int64) + base
                    recs.append((boxes, offs))
                base += os.path.getsize(r["part"])
            bboxes = np.concatenate([b for b, _ in recs], axis=0)
            offsets = np.concatenate([o for _, o in recs])
            index_bytes = build_packed_rtree(bboxes, offsets, index_node_size)
        header = _build_header(
            spec, layer_code, has_z, env, total,
            layer_name or os.path.splitext(os.path.basename(path))[0],
            crs, index_node_size if (write_leaves and total > 0) else 0,
        )
        with open(path, "wb") as out:
            out.write(MAGIC)
            out.write(header)
            out.write(index_bytes)
            for r in meta:
                with open(r["part"], "rb") as f:
                    shutil.copyfileobj(f, out, 1 << 20)
    finally:
        shutil.rmtree(parts_dir, ignore_errors=True)


# ------------------------------------------------------------------ read


def _crs_from_header(buf, header: Table) -> str | None:
    """Header -> reference-convention CRS string: 'ORG:code' when the
    Crs table carries an authority code, else the (identified) WKT."""
    crs_t = header._indirect(10)
    if crs_t is None:
        return None
    t = Table(buf, crs_t)
    code = t.scalar(1, "<i", 0)
    org = t.string(0)
    if code:
        return f"{(org or 'EPSG').upper()}:{code}"
    wkt = t.string(4)
    if wkt:
        from pyogrio_spark.crs import display_crs

        return display_crs(wkt)
    return None


_NUMPY_OF_SPARK = {"bigint": "int64", "double": "float64", "boolean": "bool",
                   "string": "object", "binary": "object"}


def flatgeobuf_info(path: str) -> dict:
    """read_info fields from the HEADER ONLY (name, envelope, geometry
    type, column spec, features_count, crs) — no feature reads; the
    features_count/envelope fields exist in the format precisely so
    metadata queries stay O(1)."""
    with open(path, "rb") as f:
        head = f.read(12)
        if head[:3] != b"fgb" or head[3] != 3 or head[4:7] != b"fgb":
            raise ValueError(f"{path}: not a FlatGeobuf file (bad magic)")
        (hsize,) = struct.unpack_from("<I", head, 8)
        f.seek(8)
        hdr_buf = f.read(4 + hsize)
    header = Table.root(hdr_buf, 4)
    envelope = header.scalar_vector(1, "d")
    layer_code = header.scalar(2, "<B", 0)
    has_z = header.scalar(3, "<B", 0)
    spec = [(c.string(0), c.scalar(1, "<B", 0)) for c in header.table_vector(7)]
    gtype = GEOM_CODE_TO_NAME.get(layer_code, "Unknown")
    return {
        "layer_name": header.string(0) or os.path.splitext(os.path.basename(path))[0],
        "features": header.scalar(8, "<Q", 0),
        "fields": [s[0] for s in spec],
        "dtypes": [_NUMPY_OF_SPARK[_spark_type(ct)] for _, ct in spec],
        "column_spec": spec,
        "total_bounds": tuple(envelope) if envelope else None,
        "geometry_type": gtype + (" Z" if has_z and gtype != "Unknown" else ""),
        "crs": _crs_from_header(hdr_buf, header),
        "encoding": "UTF-8",
        "index_node_size": header.scalar(9, "<H", 16),
    }


def read_flatgeobuf_pdf(path: str) -> tuple[pd.DataFrame, dict]:
    """Parse a FlatGeobuf file into (pandas frame with fid/attrs/
    geometry_wkb, info dict mirroring read_info)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:3] != b"fgb" or data[3] != 3 or data[4:7] != b"fgb":
        raise ValueError(f"{path}: not a FlatGeobuf file (bad magic)")
    off = 8
    (hsize,) = struct.unpack_from("<I", data, off)
    header = Table.root(data, off + 4)
    off += 4 + hsize

    layer_name = header.string(0) or os.path.splitext(os.path.basename(path))[0]
    envelope = header.scalar_vector(1, "d")
    layer_code = header.scalar(2, "<B", 0)
    features_count = header.scalar(8, "<Q", 0)
    index_node_size = header.scalar(9, "<H", 16)
    spec = [(c.string(0), c.scalar(1, "<B", 0)) for c in header.table_vector(7)]
    crs = _crs_from_header(data, header)

    if index_node_size > 0 and features_count > 0:
        off += packed_rtree_size(features_count, index_node_size)

    fids, geoms, prop_rows = [], [], []
    fid = 0
    while off + 4 <= len(data):
        (fsize,) = struct.unpack_from("<I", data, off)
        feat = Table.root(data, off + 4)
        off += 4 + fsize
        gt = feat._indirect(0)
        if gt is None:
            geoms.append(None)
        else:
            g = _parse_geometry(Table(data, gt), layer_code)
            geoms.append(W.encode_geom(g))
        ps, pn = feat.vector(1)
        prop_rows.append(_decode_properties(data[ps : ps + pn], spec) if pn else {})
        fids.append(fid)
        fid += 1

    pdf = pd.DataFrame({"fid": np.array(fids, dtype=np.int64)})
    for name, ctype in spec:
        vals = [r.get(name) for r in prop_rows]
        if ctype in (COL_LONG, COL_INT, COL_SHORT, COL_BYTE, COL_UBYTE, COL_USHORT,
                     COL_UINT, COL_ULONG) and all(v is not None for v in vals):
            pdf[name] = np.array(vals, dtype=np.int64)
        elif ctype in (COL_DOUBLE, COL_FLOAT):
            pdf[name] = np.array([np.nan if v is None else v for v in vals], dtype=np.float64)
        elif ctype == COL_BOOL and all(v is not None for v in vals):
            pdf[name] = np.array(vals, dtype=bool)
        else:
            pdf[name] = vals
    pdf["geometry_wkb"] = geoms

    seen = {W.geom_type_name(b) for b in geoms if b is not None}
    gtype = GEOM_CODE_TO_NAME.get(layer_code, "Unknown")
    if gtype == "Unknown" and len(seen) == 1:
        gtype = next(iter(seen))
    info = {
        "layer_name": layer_name,
        "features": len(geoms),
        "fields": [s[0] for s in spec],
        "dtypes": [str(pdf[s[0]].dtype) for s in spec],
        "total_bounds": tuple(envelope) if envelope else None,
        "geometry_type": gtype,
        "crs": crs,
        "encoding": "UTF-8",
        "column_spec": spec,
    }
    return pdf, info


def _spark_type(ctype: int) -> str:
    """FGB ColumnType -> Spark SQL type (shared by the driver-side and
    distributed scans, so both produce the same schema for one file)."""
    if ctype in (COL_BYTE, COL_UBYTE, COL_SHORT, COL_USHORT, COL_INT,
                 COL_UINT, COL_LONG, COL_ULONG):
        return "bigint"
    if ctype in (COL_FLOAT, COL_DOUBLE):
        return "double"
    if ctype == COL_BOOL:
        return "boolean"
    if ctype == COL_BINARY:
        return "binary"
    return "string"


def read_flatgeobuf(spark, path: str, **read_table_kwargs):
    """FlatGeobuf -> engine DataFrame (fid, attributes, geometry_wkb),
    composable with every read_table filter (where/bbox/mask/columns...).
    Driver-side parse, like the other interchange format drivers —
    corpus-scale data lives in parquet/committed tables.

    The Spark schema comes from the file's COLUMN SPEC, not pandas
    dtype sniffing — a binary attribute (object dtype of bytes) or a
    nullable boolean would otherwise fall into the string branch and
    fail createDataFrame (round-3 ADVICE)."""
    from pyogrio_spark.io.reader import read_table

    pdf, info = read_flatgeobuf_pdf(path)
    spec = info["column_spec"]
    out = pd.DataFrame({"fid": pdf["fid"].to_numpy(dtype=np.int64)})
    for name, ct in spec:
        t = _spark_type(ct)
        vals = list(pdf[name])
        if t == "bigint":
            out[name] = pd.array(
                [None if v is None or (np.isscalar(v) and pd.isna(v)) else int(v) for v in vals],
                dtype="Int64",
            )
        elif t == "double":
            out[name] = pd.array(
                [np.nan if v is None else v for v in vals], dtype="float64"
            )
        elif t == "boolean":
            out[name] = pd.array(
                [None if v is None or (np.isscalar(v) and pd.isna(v)) else bool(v) for v in vals],
                dtype="boolean",
            )
        else:  # string / binary pass through as objects
            out[name] = vals
    out["geometry_wkb"] = list(pdf["geometry_wkb"])
    schema = ", ".join(
        ["`fid` bigint"]
        + [f"`{name}` {_spark_type(ct)}" for name, ct in spec]
        + ["`geometry_wkb` binary"]
    )
    df = spark.createDataFrame(out, schema=schema)
    return read_table(spark, df, **read_table_kwargs)


def list_layers(path: str) -> list[list[str]]:
    _, info = read_flatgeobuf_pdf(path)
    return [[info["layer_name"], info["geometry_type"]]]


def _fgb_layout(path: str):
    """(spec, layer_code, feature_section_start, absolute feature
    offsets) reading only the header and either the R-tree LEAF slice
    (indexed files: one seek, 40 bytes per feature) or a 4-byte-size
    seek-walk (index-less files: no payload reads)."""
    file_size = os.path.getsize(path)
    with open(path, "rb") as f:
        head = f.read(12)
        if head[:3] != b"fgb" or head[3] != 3 or head[4:7] != b"fgb":
            raise ValueError(f"{path}: not a FlatGeobuf file (bad magic)")
        (hsize,) = struct.unpack_from("<I", head, 8)
        f.seek(8)
        hdr_buf = f.read(4 + hsize)
        header = Table.root(hdr_buf, 4)
        layer_code = header.scalar(2, "<B", 0)
        features_count = header.scalar(8, "<Q", 0)
        node_size = header.scalar(9, "<H", 16)
        spec = [(c.string(0), c.scalar(1, "<B", 0)) for c in header.table_vector(7)]
        index_off = 8 + 4 + hsize
        index_size = (
            packed_rtree_size(features_count, node_size)
            if node_size > 0 and features_count > 0
            else 0
        )
        feat0 = index_off + index_size
        if index_size:
            # leaves are the LAST features_count nodes; their offsets are
            # feature-section-relative and ascending (features are stored
            # in the same Hilbert order as the leaf level)
            f.seek(feat0 - features_count * 40)
            raw = f.read(features_count * 40)
            leaves = np.frombuffer(raw, dtype=np.uint8).reshape(features_count, 40)
            rel = leaves[:, 32:].copy().view("<u8").ravel()
            offsets = feat0 + rel.astype(np.int64)
            leaf_boxes = leaves[:, :32].copy().view("<f8").reshape(features_count, 4)
        else:
            offsets_l = []
            pos = feat0
            while pos + 4 <= file_size:
                offsets_l.append(pos)
                f.seek(pos)
                (fsize,) = struct.unpack("<I", f.read(4))
                pos += 4 + fsize
            offsets = np.array(offsets_l, dtype=np.int64)
            leaf_boxes = None
    return spec, layer_code, feat0, offsets, file_size, leaf_boxes


def read_flatgeobuf_distributed(
    spark, path: str, chunk_features: int = 50_000, **read_table_kwargs
):
    """Distributed FlatGeobuf scan: per-feature byte offsets come from
    the packed R-tree's leaf nodes (or a header-only seek-walk for
    index-less files) on the driver; executors byte-range-read and
    decode ONLY their own contiguous chunk of feature frames inside
    mapInPandas — the same plan shape as the distributed shapefile and
    GeoPackage scans. The path must be executor-visible."""
    from pyspark.sql import functions as F

    from pyogrio_spark.io.reader import read_table

    spec, layer_code, _feat0, offsets, file_size, leaf_boxes = _fgb_layout(path)
    n = len(offsets)
    if n == 0:
        # valid zero-feature file: same empty frame (and schema) the
        # single-node reader returns — distributed=True must only change
        # the plan, never the result (round-3 ADVICE)
        empty_schema = ", ".join(
            ["`fid` bigint"]
            + [f"`{name}` {_spark_type(ct)}" for name, ct in spec]
            + ["`geometry_wkb` binary"]
        )
        return read_table(spark, spark.createDataFrame([], schema=empty_schema), **read_table_kwargs)
    # bbox pushdown to the STORAGE layer: when the file carries the
    # packed R-tree, prune whole byte ranges on the driver using the
    # leaf bboxes (a superset of the exact answer — read_table's bbox
    # refine still runs on what is read). Hilbert order clusters
    # spatial neighbors, so the surviving features form few contiguous
    # runs and the scan reads only those ranges — the reference's
    # reason for the index (bounds-assisted reads, core.py:184-187).
    bbox = read_table_kwargs.get("bbox")
    if bbox is None and read_table_kwargs.get("mask") is not None:
        # a mask filter prunes by its envelope too (superset; the exact
        # mask refine still runs in read_table on what is read)
        bbox = W.bounds(bytes(read_table_kwargs["mask"]))
    if bbox is not None and leaf_boxes is not None:
        qx0, qy0, qx1, qy1 = bbox
        keep = (
            (leaf_boxes[:, 0] <= qx1)
            & (leaf_boxes[:, 2] >= qx0)
            & (leaf_boxes[:, 1] <= qy1)
            & (leaf_boxes[:, 3] >= qy0)
        )
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            idx = np.array([], dtype=np.int64)
        runs = np.split(idx, np.flatnonzero(np.diff(idx) > 1) + 1) if len(idx) else []
    else:
        runs = [np.arange(n, dtype=np.int64)]
    chunks = []
    ci = 0
    for run in runs:
        if len(run) == 0:
            continue
        for lo_i in range(0, len(run), int(chunk_features)):
            seg = run[lo_i : lo_i + int(chunk_features)]
            lo, hi = int(seg[0]), int(seg[-1]) + 1
            end = int(offsets[hi]) if hi < n else file_size
            chunks.append((ci, int(offsets[lo]), end, lo))
            ci += 1
    if not chunks:
        # bbox pruned everything: empty frame with the right schema
        chunks = [(0, int(offsets[0]), int(offsets[0]), 0)]
    chunk_df = spark.createDataFrame(
        chunks, schema="chunk_id int, byte_lo long, byte_hi long, fid_lo long"
    ).repartition(len(chunks), F.col("chunk_id"))

    schema = ", ".join(
        ["`fid` bigint"]
        + [f"`{name}` {_spark_type(ct)}" for name, ct in spec]
        + ["`geometry_wkb` binary"]
    )

    def scan(pdfs):
        for cpdf in pdfs:
            for row in cpdf.itertuples(index=False):
                with open(path, "rb") as f:
                    f.seek(row.byte_lo)
                    buf = f.read(row.byte_hi - row.byte_lo)
                geoms, prop_rows = [], []
                off = 0
                while off + 4 <= len(buf):
                    (fsize,) = struct.unpack_from("<I", buf, off)
                    feat = Table.root(buf, off + 4)
                    off += 4 + fsize
                    gt = feat._indirect(0)
                    geoms.append(
                        None if gt is None else W.encode_geom(_parse_geometry(Table(buf, gt), layer_code))
                    )
                    ps, pn = feat.vector(1)
                    prop_rows.append(_decode_properties(buf[ps : ps + pn], spec) if pn else {})
                out = pd.DataFrame(
                    {"fid": np.arange(row.fid_lo, row.fid_lo + len(geoms), dtype=np.int64)}
                )
                for name, ct in spec:
                    vals = [r.get(name) for r in prop_rows]
                    t = _spark_type(ct)
                    if t == "bigint":
                        out[name] = pd.array(vals, dtype="Int64")
                    elif t == "double":
                        out[name] = pd.array(
                            [np.nan if v is None else v for v in vals], dtype="float64"
                        )
                    elif t == "boolean":
                        out[name] = pd.array(vals, dtype="boolean")
                    else:
                        out[name] = vals
                out["geometry_wkb"] = geoms
                yield out

    df = chunk_df.mapInPandas(scan, schema=schema)
    return read_table(spark, df, **read_table_kwargs)
