import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pyogrio_spark.fixtures import DOCS_SPARK_SCHEMA, make_docs
from pyogrio_spark.io.lineage import StageCheckpoint, cell_range_units, unit_filter
from pyogrio_spark.io.writer import current_snapshot, read_committed, write_table
import numpy as np

from pyogrio_spark.operators.multimodal import (
    explode_media_spans,
    extract_video_frames,
)
from pyogrio_spark.streaming.events import sessionize_events, windowed_event_counts


def test_write_commit_append_overwrite(spark, tmp_path):
    docs = spark.createDataFrame(make_docs(100), schema=DOCS_SPARK_SCHEMA)
    path = str(tmp_path / "t1")
    s1 = write_table(docs.filter("xmin < 0"), path, mode="overwrite")
    n1 = read_committed(spark, path).count()
    s2 = write_table(docs.filter("xmin >= 0"), path, mode="append")
    n2 = read_committed(spark, path).count()
    assert n2 == 100 and n1 < 100
    assert current_snapshot(path)["id"] == s2
    s3 = write_table(docs.limit(5), path, mode="overwrite")
    assert read_committed(spark, path).count() == 5


def test_crs_roundtrip_through_table_properties(spark, tmp_path):
    from pyogrio_spark.io.reader import read_info

    docs = spark.createDataFrame(make_docs(30), schema=DOCS_SPARK_SCHEMA)
    path = str(tmp_path / "crs_t")
    write_table(docs, path, mode="overwrite", properties={"crs": "EPSG:3857"})
    info = read_info(spark, path)
    assert info.crs == "EPSG:3857"
    assert info.geometry_type == "Point"


def test_failed_write_leaves_previous_snapshot(spark, tmp_path):
    docs = spark.createDataFrame(make_docs(50), schema=DOCS_SPARK_SCHEMA)
    path = str(tmp_path / "t2")
    write_table(docs, path, mode="overwrite")
    before = current_snapshot(path)
    # simulate a killed writer: data dir written, manifest never swapped
    os.makedirs(os.path.join(path, "data", "deadbeef"), exist_ok=True)
    assert current_snapshot(path) == before
    assert read_committed(spark, path).count() == 50


def test_lineage_resume_skips_completed_units(spark, tmp_path):
    docs = spark.createDataFrame(make_docs(400), schema=DOCS_SPARK_SCHEMA).cache()
    root = str(tmp_path / "ckpt")
    units = cell_range_units(docs, n_units=4)
    assert len(units) >= 2

    calls = {"n": 0}

    def run_stage(ckpt):
        for i, (key, lo, hi) in enumerate(units):
            last = i == len(units) - 1

            def produce(lo=lo, hi=hi, last=last):
                calls["n"] += 1
                return unit_filter(docs, lo, hi, last).select("doc_id", "cell_id")

            ckpt.run_unit(key, produce)

    ck = StageCheckpoint(spark, root, "stage1", input_snapshot="snapA")
    # first run: do only the first two units, then "die"
    for i, (key, lo, hi) in enumerate(units[:2]):
        last = i == len(units) - 1
        ck.run_unit(key, lambda lo=lo, hi=hi, last=last: (calls.__setitem__("n", calls["n"] + 1), unit_filter(docs, lo, hi, last).select("doc_id", "cell_id"))[1])
    died_after = calls["n"]
    assert died_after == 2

    # resume: a fresh checkpoint object re-runs only the missing units
    ck2 = StageCheckpoint(spark, root, "stage1", input_snapshot="snapA")
    assert set(ck2.pending([u[0] for u in units])) == {u[0] for u in units[2:]}
    run_stage(ck2)
    assert calls["n"] == len(units)  # completed units were NOT recomputed

    out = ck2.read_output()
    assert out.count() == docs.count()  # every row exactly once


def test_lineage_resume_after_mid_unit_kill(spark, tmp_path):
    """Kill DURING a unit: its data files exist but neither the unit's
    manifest-swapped snapshot nor its lineage row was committed. Resume
    must re-run exactly that unit and output every row exactly once."""
    docs = spark.createDataFrame(make_docs(400), schema=DOCS_SPARK_SCHEMA).cache()
    root = str(tmp_path / "ckpt_kill")
    units = cell_range_units(docs, n_units=4)
    assert len(units) >= 3

    ck = StageCheckpoint(spark, root, "s", input_snapshot="snapA")
    key0, lo0, hi0 = units[0]
    ck.run_unit(key0, lambda: unit_filter(docs, lo0, hi0, False).select("doc_id", "cell_id"))

    # mid-unit kill on unit 1: parquet files land in the unit dir but the
    # snapshot manifest swap never happens (simulated by writing raw files)
    key1, lo1, hi1 = units[1]
    dead_dir = os.path.join(root, "s", "units", key1.replace("/", "_"), "data", "halfdone")
    unit_filter(docs, lo1, hi1, False).select("doc_id", "cell_id").write.mode("overwrite").parquet(dead_dir)
    assert key1 not in ck.completed()  # the kill left no lineage row

    # resume re-runs unit 1 (and the rest); unit 0 is not recomputed
    ck2 = StageCheckpoint(spark, root, "s", input_snapshot="snapA")
    pend = ck2.pending([u[0] for u in units])
    assert pend == [u[0] for u in units[1:]]
    for i, (key, lo, hi) in enumerate(units):
        if key in pend:
            last = i == len(units) - 1
            ck2.run_unit(key, lambda lo=lo, hi=hi, last=last: unit_filter(docs, lo, hi, last).select("doc_id", "cell_id"))
    out = ck2.read_output()
    assert out.count() == docs.count()  # exactly once, no double-count from the dead files
    assert out.select("doc_id").distinct().count() == docs.count()


def test_media_span_extraction_and_video_frames(spark):
    docs = spark.createDataFrame(make_docs(300), schema=DOCS_SPARK_SCHEMA)
    media = explode_media_spans(docs)
    n_media = media.count()
    assert n_media > 0
    # real Y4M codec: deterministic synthesis -> container walk; every
    # sampled frame's mean luma must equal the closed-form constant
    docs2 = docs.withColumn("doc_id", F.monotonically_increasing_id())
    feats = extract_video_frames(docs2, every_n=2, max_frames=4).toPandas()
    assert len(feats) > 0
    for _, r in feats.head(50).iterrows():
        assert r.width == 8 + 2 * ((r.doc_id * 3 + r.span_offset) % 12)
        assert r.mean_luma == float((r.doc_id * 7 + r.span_offset * 11 + r.frame_index * 13) % 256)
        assert r.frame_index % 2 == 0 and r.frame_index < r.n_frames
    # per-asset frame counts: every 2nd frame, capped at 4
    per = feats.groupby(["doc_id", "span_offset"]).agg(n=("frame_index", "size"), nf=("n_frames", "first"))
    assert (per.n == np.minimum((per.nf + 1) // 2, 4)).all()


def test_y4m_codec_roundtrip_unit():
    from pyogrio_spark.operators.multimodal import decode_y4m_frames, synthesize_y4m

    b = synthesize_y4m(5, 1)
    rows = decode_y4m_frames(pd.Series([b, None, b"junk"]), every_n=2, max_frames=4)
    assert all(r[0] == 0 for r in rows)  # invalid payloads contribute nothing
    w, h, nf = 8 + 2 * ((5 * 3 + 1) % 12), 8 + 2 * ((5 * 5 + 1) % 8), 4 + (5 + 1) % 8
    assert rows[0][1:] == (w, h, nf, 0, float((5 * 7 + 1 * 11) % 256))
    assert [r[4] for r in rows] == [0, 2, 4, 6][: len(rows)]
    # a C420 stream (chroma planes present) still means over the Y plane
    y4m420 = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n" + (b"FRAME\n" + bytes([9]) * 16 + bytes([128]) * 8) * 2
    rows420 = decode_y4m_frames(pd.Series([y4m420]), every_n=1, max_frames=8)
    assert [(r[4], r[5]) for r in rows420] == [(0, 9.0), (1, 9.0)] and rows420[0][3] == 2


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    import shutil

    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    shutil.copy("/root/testdata/sf0.001/events.parquet", stream_dir)
    events = spark.read.parquet(stream_dir)
    batch = windowed_event_counts(events).toPandas()
    stream = windowed_event_counts(
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(stream_dir)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").toPandas()
    a = batch.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = got.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    sess = sessionize_events(events).toPandas()
    assert len(sess) > 0 and (sess.n_events >= 1).all()


def test_concurrent_appends_lose_no_snapshot(spark, tmp_path):
    # two writers racing on one table: the manifest lock must serialize
    # the read-modify-write so neither append is silently dropped
    import threading

    path = str(tmp_path / "tbl_race")
    df = spark.range(10).withColumnRenamed("id", "v")
    ids, errs = [], []

    def go():
        try:
            ids.append(write_table(df, path, mode="append"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=go) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs and len(set(ids)) == 2
    from pyogrio_spark.io.writer import _read_manifest

    m = _read_manifest(path)
    assert {s["id"] for s in m["snapshots"]} == set(ids)
    assert read_committed(spark, path).count() == 20  # both appends visible


def test_span_sequence_survives_storage_roundtrip(spark, tmp_path):
    # north-rule invariant: the interleaved span sequence survives a
    # write_table -> read_committed storage round trip byte-identically
    import pandas as pd

    from pyogrio_spark.functions.geo import span_digest

    pdf = pd.DataFrame(
        {
            "doc_id": list(range(20)),
            "spans": [
                [
                    {"kind": "text", "text": f"chunk {i}", "media_ref": None, "offset": 0},
                    {"kind": "media", "text": None, "media_ref": f"m://{i}/0", "offset": 1},
                    {"kind": "text", "text": f"tail {i}", "media_ref": None, "offset": 2},
                ]
                for i in range(20)
            ],
        }
    )
    schema = "doc_id long, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    df = spark.createDataFrame(pdf, schema=schema)
    before = {r.doc_id: r.d for r in df.select("doc_id", span_digest().alias("d")).collect()}
    path = str(tmp_path / "span_tbl")
    write_table(df.repartition(4), path)
    back = read_committed(spark, path)
    after = {r.doc_id: r.d for r in back.select("doc_id", span_digest().alias("d")).collect()}
    assert before == after


def test_pgm_decoder_handles_comments_and_roundtrip():
    import numpy as np
    import pandas as pd

    from pyogrio_spark.operators.multimodal import decode_pgm_batch, synthesize_pgm

    # synthesized payloads decode to their closed-form parameters
    out = decode_pgm_batch(pd.Series([synthesize_pgm(12, 1)]))
    assert (out.width[0], out.height[0], out.maxval[0]) == (8 + 37 % 24, 8 + 61 % 16, 255)
    assert out.mean_luma[0] == (12 * 7 + 11) % 256
    # netpbm grammar: comments between header fields are legal
    img = b"P5\n# a comment\n4 2\n# another\n255\n" + bytes(range(8))
    out2 = decode_pgm_batch(pd.Series([img]))
    assert (out2.width[0], out2.height[0]) == (4, 2)
    assert abs(out2.mean_luma[0] - np.arange(8).mean()) < 1e-12
    # non-PGM bytes -> nulls
    assert decode_pgm_batch(pd.Series([b"nope"])).width.isna().all()


def test_pgm_resize_semantics():
    import numpy as np
    import pandas as pd

    from pyogrio_spark.operators.multimodal import decode_pgm_batch, resize_pgm_batch

    # gradient image: resize keeps dims contract and plausible content
    w, h = 32, 8
    raster = (np.arange(w * h, dtype=np.uint8) % 256).reshape(h, w)
    img = f"P5\n{w} {h}\n255\n".encode() + raster.tobytes()
    small = resize_pgm_batch(pd.Series([img]), max_side=16)[0]
    meta = decode_pgm_batch(pd.Series([small])).iloc[0]
    assert meta.width == 16 and meta.height == 4  # (side*16)//32
    # never upsamples
    tiny = f"P5\n4 4\n255\n".encode() + bytes(16)
    assert bytes(resize_pgm_batch(pd.Series([tiny]), max_side=16)[0]) == tiny


def test_compact_table_rewrites_small_files_atomically(spark, tmp_path):
    """Compaction: a fragmented table (32 tiny files) rewrites into few
    target-size files as a NEW overwrite snapshot — same rows, same
    schema, old snapshot id recorded, file count actually reduced."""
    from pyspark.sql import functions as F

    from pyogrio_spark.io.writer import _dir_file_stats, compact_table

    tbl = str(tmp_path / "frag_table")
    df = (
        spark.range(5000)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("k"),
            F.concat(F.lit("v"), F.col("id").cast("string")).alias("payload"),
        )
        .repartition(32)
    )
    write_table(df, tbl, mode="overwrite")
    before = current_snapshot(tbl)
    stats = compact_table(spark, tbl, target_bytes=40 << 10)  # ~40 KiB targets
    after = current_snapshot(tbl)

    assert stats["files_before"] == 32
    assert stats["files_after"] < 32 and stats["files_after"] >= 1
    assert stats["rows"] == 5000
    assert after["id"] != before["id"] and after["operation"] == "overwrite"

    got = read_committed(spark, tbl)
    assert got.count() == 5000
    assert set(got.columns) == {"id", "k", "payload"}
    assert got.agg(F.sum("id")).collect()[0][0] == 5000 * 4999 // 2

    # sort_by variant range-clusters: each output file holds a disjoint
    # k-range (parquet min/max pruning actually bites)
    compact_table(spark, tbl, target_bytes=40 << 10, sort_by=["k"])
    cur = current_snapshot(tbl)
    import os as _os

    data_dir = _os.path.join(tbl, cur["data_dirs"][-1])
    parts = sorted(p for p in _os.listdir(data_dir) if p.endswith(".parquet"))
    import pyarrow.parquet as pq

    ranges = []
    for p in parts:
        t = pq.read_table(_os.path.join(data_dir, p), columns=["k"])
        if t.num_rows:
            ks = t["k"].to_pylist()
            ranges.append((min(ks), max(ks)))
    ranges.sort()
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (range partitioned)


def test_expire_snapshots_reclaims_unreferenced_dirs(spark, tmp_path):
    """Vacuum after compaction: overwrite-orphaned data dirs are
    deleted, the current snapshot still reads in full, and an append
    after expiry keeps working."""
    import os as _os

    from pyspark.sql import functions as F

    from pyogrio_spark.io.writer import compact_table, expire_snapshots

    tbl = str(tmp_path / "vacuum_table")
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    write_table(df.repartition(8), tbl, mode="overwrite")
    write_table(df.repartition(8), tbl, mode="append")  # 2000 rows now
    compact_table(spark, tbl, target_bytes=1 << 20)

    data_root = _os.path.join(tbl, "data")
    assert len(_os.listdir(data_root)) == 3  # two originals + compacted

    out = expire_snapshots(tbl)
    assert len(out["removed"]) == 2 and len(out["kept"]) == 1
    assert sorted(_os.listdir(data_root)) == [
        _os.path.basename(k) for k in out["kept"]
    ]
    assert read_committed(spark, tbl).count() == 2000

    write_table(df.limit(10), tbl, mode="append")
    assert read_committed(spark, tbl).count() == 2010


def test_compaction_conflict_never_drops_concurrent_append(spark, tmp_path):
    """Optimistic concurrency: an append that lands between a rewrite's
    snapshot read and its commit makes the stale commit fail with
    SnapshotConflict (direct write_table) and makes compact_table
    retry from the NEW current — the appended rows survive."""
    from pyspark.sql import functions as F

    from pyogrio_spark.io.writer import SnapshotConflict, compact_table

    tbl = str(tmp_path / "occ_table")
    df = spark.range(500).select(F.col("id"))
    write_table(df.repartition(8), tbl, mode="overwrite")
    stale = current_snapshot(tbl)["id"]

    # the race: another writer commits while our rewrite is in flight
    write_table(df.selectExpr("id + 1000 AS id"), tbl, mode="append")

    with pytest.raises(SnapshotConflict, match="advanced"):
        write_table(df, tbl, mode="overwrite", expected_current_id=stale)

    # compact_table re-reads current and keeps both halves
    stats = compact_table(spark, tbl, target_bytes=1 << 20)
    assert stats["rows"] == 1000
    got = read_committed(spark, tbl)
    assert got.count() == 1000
    assert got.filter("id >= 1000").count() == 500


def test_expire_snapshots_spares_inflight_uncommitted_dir(spark, tmp_path):
    """write_table lands data BEFORE taking the manifest lock; a
    concurrent expiry must not delete that in-flight dir (round-5
    ADVICE: doing so loses the writer's about-to-commit snapshot).
    Uncommitted dirs younger than the retention age are kept; old dead
    ones are reclaimed."""
    import os as _os

    from pyspark.sql import functions as F

    from pyogrio_spark.io.writer import expire_snapshots

    tbl = str(tmp_path / "inflight_table")
    df = spark.range(100).select(F.col("id"))
    write_table(df, tbl, mode="overwrite")
    write_table(df, tbl, mode="overwrite")  # first dir now unreferenced

    # simulate a writer mid-flight: data dir exists, not in manifest
    inflight = _os.path.join(tbl, "data", "deadbeefdeadbeef")
    _os.makedirs(inflight)
    open(_os.path.join(inflight, "part-0.parquet"), "w").close()

    out = expire_snapshots(tbl)
    assert len(out["removed"]) == 1          # superseded committed dir goes
    assert out["kept_orphans"] == ["deadbeefdeadbeef"]
    assert _os.path.isdir(inflight)          # in-flight dir survives

    # aged past retention -> reclaimed as a dead write
    old = __import__("time").time() - 7 * 86400
    _os.utime(inflight, (old, old))
    out2 = expire_snapshots(tbl)
    assert out2["removed"] == ["deadbeefdeadbeef"]
    assert not _os.path.isdir(inflight)


def test_upsert_table_merge_semantics(spark, tmp_path):
    """COW MERGE: matched keys replaced, unmatched survive, new keys
    insert — one atomic overwrite snapshot."""
    from pyogrio_spark.io.writer import upsert_table

    tbl = str(tmp_path / "merge_tbl")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k bigint, v string")
    upsert_table(spark, tbl, base, keys=["k"])
    updates = spark.createDataFrame(
        [(3, "NEW3"), (7, "NEW7"), (100, "NEW100")], "k bigint, v string"
    )
    res = upsert_table(spark, tbl, updates, keys=["k"])
    assert res["matched"] == 2 and res["inserted"] == 1 and res["rows"] == 11
    got = {r["k"]: r["v"] for r in read_committed(spark, tbl).collect()}
    assert got[3] == "NEW3" and got[7] == "NEW7" and got[100] == "NEW100"
    assert got[0] == "v0" and len(got) == 11
    # snapshot history: two snapshots, current is the merge
    assert current_snapshot(tbl)["operation"] == "overwrite"


def test_upsert_table_conflict_retry_keeps_concurrent_append(spark, tmp_path):
    """An append landing between the upsert's read and commit must
    survive: the upsert recomputes from the new current."""
    from pyogrio_spark.io import writer as W

    tbl = str(tmp_path / "merge_conflict")
    base = spark.createDataFrame([(i, "old") for i in range(5)], "k bigint, v string")
    W.upsert_table(spark, tbl, base, keys=["k"])

    real_write = W.write_table
    raced = {"done": False}

    def racing_write(df, path, **kw):
        # first commit attempt: sneak an append in just before it, so
        # the validate-and-swap sees an advanced table exactly once
        if not raced["done"] and kw.get("expected_current_id"):
            raced["done"] = True
            extra = spark.createDataFrame([(999, "appended")], "k bigint, v string")
            real_write(extra, path, mode="append")
        return real_write(df, path, **kw)

    W.write_table, orig = racing_write, W.write_table
    try:
        res = W.upsert_table(spark, tbl, spark.createDataFrame([(2, "NEW2")], "k bigint, v string"), keys=["k"])
    finally:
        W.write_table = orig
    got = {r["k"]: r["v"] for r in read_committed(spark, tbl).collect()}
    assert got[999] == "appended", "concurrent append was clobbered by the upsert"
    # 5 base rows + the raced append, k=2 replaced in place -> 6
    assert got[2] == "NEW2" and res["rows"] == 6


def test_delete_from_table(spark, tmp_path):
    from pyogrio_spark.io.writer import delete_from_table, upsert_table

    tbl = str(tmp_path / "del_tbl")
    base = spark.createDataFrame([(i, i % 3) for i in range(30)], "k bigint, bucket bigint")
    upsert_table(spark, tbl, base, keys=["k"])
    res = delete_from_table(spark, tbl, "bucket = 1")
    assert res["deleted"] == 10 and res["rows"] == 20
    assert read_committed(spark, tbl).filter("bucket = 1").count() == 0


def test_delete_from_table_null_predicate_keeps_rows(spark, tmp_path):
    """SQL DELETE WHERE removes only rows where the predicate is TRUE;
    NULL-predicate rows (nullable column) must survive the delete."""
    from pyogrio_spark.io.writer import delete_from_table, upsert_table

    tbl = str(tmp_path / "del_null_tbl")
    base = spark.createDataFrame(
        [(0, 5), (1, None), (2, 20), (3, None), (4, 7)], "k bigint, score bigint"
    )
    upsert_table(spark, tbl, base, keys=["k"])
    res = delete_from_table(spark, tbl, "score > 10")
    # only k=2 matches TRUE; the two NULL-score rows are kept
    assert res["deleted"] == 1 and res["rows"] == 4
    kept = {r["k"] for r in read_committed(spark, tbl).collect()}
    assert kept == {0, 1, 3, 4}


def test_upsert_table_rejects_duplicate_key_updates(spark, tmp_path):
    """MERGE contract: multiple source rows per key is ambiguous and
    must fail fast (Delta/Iceberg raise), not silently corrupt the
    keyed-table invariant."""
    import pytest as _pytest
    from pyogrio_spark.io.writer import upsert_table

    tbl = str(tmp_path / "merge_dup_tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string")
    upsert_table(spark, tbl, base, keys=["k"])
    dup_updates = spark.createDataFrame(
        [(1, "x"), (1, "y"), (3, "z")], "k bigint, v string"
    )
    with _pytest.raises(ValueError, match="multiple rows"):
        upsert_table(spark, tbl, dup_updates, keys=["k"])
    # table unchanged
    got = {r["k"]: r["v"] for r in read_committed(spark, tbl).collect()}
    assert got == {1: "a", 2: "b"}
