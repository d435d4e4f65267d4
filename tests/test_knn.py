import pandas as pd
import pytest

from pyogrio_spark.fixtures import DOCS_SPARK_SCHEMA, make_docs, make_knn_probes
from pyogrio_spark.operators.knn import knn_join
from pyogrio_spark.oracle import oracle_knn


@pytest.fixture(scope="module")
def docs_pd():
    return make_docs(1200)


@pytest.fixture(scope="module")
def probes_pd():
    return make_knn_probes(40)


def _norm(df: pd.DataFrame):
    return sorted(map(tuple, df[["probe_id", "doc_id", "rank"]].itertuples(index=False, name=None)))


def test_knn_matches_bruteforce(spark, docs_pd, probes_pd):
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    probes = spark.createDataFrame(
        probes_pd[["probe_id", "lon", "lat"]], schema="probe_id string, lon double, lat double"
    )
    got = knn_join(probes, docs, k=5).toPandas()
    want = oracle_knn(probes_pd, docs_pd, k=5)
    assert _norm(got) == _norm(want)
    # every probe got exactly k neighbors
    assert got.groupby("probe_id").size().eq(5).all()


def test_knn_k_larger_than_cell_population(spark, docs_pd, probes_pd):
    # force heavy ring expansion: k close to a sparse region's population
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    probes = spark.createDataFrame(
        probes_pd[["probe_id", "lon", "lat"]].head(8), schema="probe_id string, lon double, lat double"
    )
    got = knn_join(probes, docs, k=25).toPandas()
    want = oracle_knn(probes_pd.head(8), docs_pd, k=25)
    assert _norm(got) == _norm(want)


def test_knn_clamped_window_edge_probe_is_exact(spark):
    # Regression: window_covers_grid used (2r+1) >= n, but the window is
    # clamped — from a corner probe r=2 at res=2 (n=4) explores only
    # cells [0,2]^2, yet 2r+1=5 >= 4 fired the shortcut and returned a
    # window doc (~294 deg away) over the true nearest in unexplored
    # cell (3,0) (~274 deg away). r >= n-1 is the sound condition.
    from pyogrio_spark.index.grid import cell_of

    probes = spark.createDataFrame(
        [("p0", -179.0, -89.0)], schema="probe_id string, lon double, lat double"
    )
    pts = pd.DataFrame(
        {
            "doc_id": ["far_in_window", "near_outside_window"],
            "xmin": [85.0, 95.0],
            "ymin": [40.0, -89.0],
        }
    )
    pts["cell_id"] = cell_of(pts.xmin.to_numpy(), pts.ymin.to_numpy(), 2)
    docs = spark.createDataFrame(pts, schema="doc_id string, xmin double, ymin double, cell_id long")
    got = knn_join(probes, docs, k=1, res=2, initial_ring=2).toPandas()
    assert got.doc_id.tolist() == ["near_outside_window"]


def test_knn_res_mismatch_raises(spark, docs_pd, probes_pd):
    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)  # indexed at res=7
    probes = spark.createDataFrame(
        probes_pd[["probe_id", "lon", "lat"]].head(2), schema="probe_id string, lon double, lat double"
    )
    with pytest.raises(ValueError, match="res=7"):
        knn_join(probes, docs, k=1, res=6)


def _haversine_np(plon, plat, dlon, dlat):
    import numpy as np

    R = 6371.0088
    dphi = np.radians(dlat - plat)
    dlmb = np.radians(dlon - plon)
    h = np.sin(dphi / 2) ** 2 + np.cos(np.radians(plat)) * np.cos(np.radians(dlat)) * np.sin(dlmb / 2) ** 2
    return 2 * R * np.arcsin(np.sqrt(np.minimum(h, 1.0)))


def test_knn_haversine_matches_bruteforce(spark, docs_pd, probes_pd):
    import numpy as np

    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    probes = spark.createDataFrame(
        probes_pd[["probe_id", "lon", "lat"]].head(15), schema="probe_id string, lon double, lat double"
    )
    got = knn_join(probes, docs, k=5, metric="haversine").toPandas()
    assert got.groupby("probe_id").size().eq(5).all()
    dl = docs_pd.xmin.to_numpy()
    db = docs_pd.ymin.to_numpy()
    for _, p in probes_pd.head(15).iterrows():
        d = _haversine_np(p.lon, p.lat, dl, db)
        order = np.lexsort((docs_pd.doc_id.to_numpy(), d))[:5]
        want = set(docs_pd.doc_id.to_numpy()[order])
        mine = got[got.probe_id == p.probe_id]
        assert set(mine.doc_id) == want, f"probe {p.probe_id}"
        # distances agree with the numpy formula
        dd = {doc: dist for doc, dist in zip(docs_pd.doc_id.to_numpy()[order], d[order])}
        for _, row in mine.iterrows():
            assert abs(row.dist - dd[row.doc_id]) < 1e-9


def test_knn_haversine_dateline_wraps(spark):
    """Regression (round-2 ADVICE medium): the haversine window must wrap
    at the antimeridian. Setup at res=7 (cell_w=2.8125deg), probe at lon
    179.9, initial_ring=4: a decoy at 589 km sits INSIDE the r=4
    guarantee (min(lat 625 km, lon 1243 km)), so a clamped window would
    declare the probe satisfied with the decoy while the true nearest
    neighbor (22 km away, across the dateline in column 0) was never
    explored. Modular column enumeration finds it in round one."""
    from pyogrio_spark.index.grid import cell_of

    probes = spark.createDataFrame(
        [("dateline", 179.9, 0.0)], schema="probe_id string, lon double, lat double"
    )
    pts = pd.DataFrame(
        {
            "doc_id": ["near_across_dateline", "decoy_in_window"],
            "xmin": [-179.9, 174.6],
            "ymin": [0.0, 0.0],
        }
    )
    pts["cell_id"] = cell_of(pts.xmin.to_numpy(), pts.ymin.to_numpy(), 7)
    docs = spark.createDataFrame(pts, schema="doc_id string, xmin double, ymin double, cell_id long")
    got = knn_join(probes, docs, k=1, res=7, initial_ring=4, metric="haversine").toPandas()
    assert got.doc_id.tolist() == ["near_across_dateline"]
    assert abs(got.dist.iloc[0] - _haversine_np(179.9, 0.0, -179.9, 0.0)) < 1e-9


def test_knn_carry_rescans_ring_only(spark, docs_pd, probes_pd):
    """Candidate carry (round-2 VERDICT deferral): re-probe rounds must
    enumerate only the NEW ring of cells, with prior-window candidates
    arriving via the carried frame — and the result must still equal the
    brute-force oracle exactly."""
    from pyogrio_spark.operators import knn as knn_mod

    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    probes = spark.createDataFrame(
        probes_pd[["probe_id", "lon", "lat"]].head(3), schema="probe_id string, lon double, lat double"
    )
    # initial_ring=1 + k=25 forces several expansion rounds
    got = knn_join(probes, docs, k=25, initial_ring=1).toPandas()
    want = oracle_knn(probes_pd.head(3), docs_pd, k=25)
    assert _norm(got) == _norm(want)
    trace = knn_mod.LAST_RUN_TRACE
    assert len(trace) >= 3, trace
    rescans = [t for t in trace[1:] if not t["ring_only"]]
    # every re-probe round before a full-grid net is ring-only
    n = 1 << 7
    assert all(t["r"] >= n - 1 for t in rescans), trace
    assert any(t["carried_rows"] > 0 for t in trace), trace


def test_knn_haversine_polar_bound_satisfies_early(spark):
    """Regression: the old longitude guarantee used the window's WORST
    latitude, which hits the pole (|lat| + r*cell_h >= 90 at r=4 here)
    and collapses to 0 — a polar probe then stays unsatisfied until the
    all-columns-explored lat-only branch at r=64 (measured 341 s at
    sf0.1). The cross-track bound R*asin(cos(probe_lat)*sin(lam)) stays
    positive (119 km at r=4 for lat -84.5), so a probe whose k-th
    neighbor is 66.7 km away satisfies at r=4 with nearly every column
    still unexplored."""
    import numpy as np

    from pyogrio_spark.index.grid import cell_of
    from pyogrio_spark.operators import knn as knn_mod

    lats = -84.5 + np.array([0.4, -0.4, 0.5, -0.5, 0.6, -0.6, 0.7, -0.7, 0.8, -0.8])
    pts = pd.DataFrame({"doc_id": [f"d{i}" for i in range(10)], "xmin": 3.0, "ymin": lats})
    pts["cell_id"] = cell_of(pts.xmin.to_numpy(), pts.ymin.to_numpy(), 7)
    docs = spark.createDataFrame(pts, schema="doc_id string, xmin double, ymin double, cell_id long")
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": ["south"], "lon": [3.0], "lat": [-84.5]}),
        schema="probe_id string, lon double, lat double",
    )
    got = knn_join(probes, docs, k=5, metric="haversine", initial_ring=1).toPandas()
    d = _haversine_np(3.0, -84.5, pts.xmin.to_numpy(), pts.ymin.to_numpy())
    order = np.lexsort((pts.doc_id.to_numpy(), d))[:5]
    assert set(got.doc_id) == set(pts.doc_id.to_numpy()[order])
    # satisfied while some window column was still unexplored (the old
    # bound only terminated via the all-columns-explored lat-only branch)
    last = knn_mod.LAST_RUN_TRACE[-1]
    assert 2 * last["r"] + 1 < (1 << 7), knn_mod.LAST_RUN_TRACE


def test_knn_haversine_polar_probe_exact(spark, docs_pd):
    # near the pole the longitude guarantee collapses; the loop must
    # still terminate with the exact answer (full-grid fallback)
    import numpy as np

    docs = spark.createDataFrame(docs_pd, schema=DOCS_SPARK_SCHEMA)
    probes = spark.createDataFrame(
        pd.DataFrame({"probe_id": ["polar"], "lon": [12.0], "lat": [89.5]}),
        schema="probe_id string, lon double, lat double",
    )
    got = knn_join(probes, docs, k=3, metric="haversine").toPandas()
    d = _haversine_np(12.0, 89.5, docs_pd.xmin.to_numpy(), docs_pd.ymin.to_numpy())
    order = np.lexsort((docs_pd.doc_id.to_numpy(), d))[:3]
    assert set(got.doc_id) == set(docs_pd.doc_id.to_numpy()[order])


def test_within_distance_join_wrap_and_plan(spark):
    """Bounded-distance join: exact pairs vs numpy brute force incl. an
    antimeridian pair (lon wraps modularly in the cell window even
    though planar distance does not); broadcast window, no Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from pyogrio_spark.index.grid import cell_expr_sql
    from pyogrio_spark.operators.knn import within_distance_join

    rng = np.random.default_rng(11)
    lon = np.concatenate([rng.uniform(-30, 30, 300), [179.95, -179.95]])
    lat = np.concatenate([rng.uniform(-30, 30, 300), [0.0, 0.05]])
    pdf = pd.DataFrame({"doc_id": np.arange(len(lon), dtype=np.int64), "xmin": lon, "ymin": lat})
    res = 6
    docs = spark.createDataFrame(pdf).withColumn(
        "cell_id", F.expr(cell_expr_sql("xmin", "ymin", res))
    )
    probes = docs.filter("doc_id < 20 or doc_id >= 300").selectExpr(
        "doc_id AS probe_id", "xmin AS lon", "ymin AS lat"
    )
    r = 3.0000017
    out = within_distance_join(probes, docs, radius=r, res=res)
    got = {(x["probe_id"], x["doc_id"]) for x in out.collect()}

    pl = pdf[(pdf.doc_id < 20) | (pdf.doc_id >= 300)]
    want = set()
    for p in pl.itertuples():
        d2 = (pdf.xmin - p.xmin) ** 2 + (pdf.ymin - p.ymin) ** 2
        for did in pdf.doc_id[np.sqrt(d2) < r]:
            want.add((p.doc_id, int(did)))
    assert got == want
    # the antimeridian pair is NOT within planar distance (359.9 degrees
    # apart in unwrapped lon) — the planar metric is unwrapped by
    # contract; the wrap only widens the candidate window safely
    assert (300, 301) not in got and (300, 300) in got

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
