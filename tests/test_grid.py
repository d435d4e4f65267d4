import numpy as np

from pyogrio_spark.index import grid as G


def test_cell_roundtrip():
    lon = np.array([-179.9, 0.0, 179.9, 12.34])
    lat = np.array([-89.9, 0.0, 89.9, 45.6])
    for res in (0, 3, 7, 15, 28):
        c = G.cell_of(lon, lat, res)
        assert (G.cell_res(c) == res).all()
        x0, y0, x1, y1 = G.cell_bounds(c, res)
        assert ((lon >= x0) & (lon < x1 + 1e-9)).all()
        assert ((lat >= y0) & (lat < y1 + 1e-9)).all()


def test_edge_clamping():
    c = G.cell_of(np.array([180.0, -180.0]), np.array([90.0, -90.0]), 5)
    x, y = G.cell_to_xy(c, 5)
    assert x[0] == 31 and y[0] == 31 and x[1] == 0 and y[1] == 0


def test_parent_children():
    c = G.cell_of(np.array([10.0]), np.array([20.0]), 8)[0]
    p = G.parent(np.array([c]), 8)[0]
    assert G.cell_res(p) == 7
    kids = G.children(np.array([p]), 7)
    assert c in kids.ravel().tolist()


def test_disk_wraps_lon_clamps_lat():
    res = 4
    n = 1 << res
    c = int(G.xy_to_cell(np.int64(0), np.int64(0), res))  # SW corner
    d = G.disk(c, 1, res)
    xs, ys = G.cell_to_xy(d, res)
    assert (ys >= 0).all()  # no wrap south of the pole
    assert (n - 1) in xs.tolist()  # lon wrapped to the east edge
    assert len(d) == 6  # 3 x-cols x 2 y-rows


def test_cover_bbox():
    cells = G.cover_bbox(-1.0, -1.0, 1.0, 1.0, 7)
    # bbox straddles the origin; at res 7 one cell is 2.8125 x 1.40625 deg
    assert len(cells) >= 4
    for c in cells:
        x0, y0, x1, y1 = G.cell_bounds(np.int64(c), 7)
        assert x1 > -1.0 and x0 < 1.0 and y1 > -1.0 and y0 < 1.0


def test_sql_expr_matches_numpy():
    import duckdb

    lon, lat = 12.34, 45.6
    res = 9
    expr = G.cell_expr_sql(str(lon), str(lat), res)
    got = duckdb.sql(f"select {expr} as c").fetchone()[0]
    want = int(G.cell_of(np.array([lon]), np.array([lat]), res)[0])
    assert got == want
