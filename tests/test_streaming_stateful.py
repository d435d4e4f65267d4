import os
import shutil

import pytest

from pyogrio_spark.streaming.stateful import streaming_first_seen, streaming_running_totals


@pytest.fixture()
def events_stream_dir(tmp_path):
    d = str(tmp_path / "ev")
    os.makedirs(d)
    shutil.copy("/root/testdata/sf0.001/events.parquet", d)
    return d


def test_streaming_first_seen_dedup(spark, events_stream_dir, tmp_path):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    out = streaming_first_seen(stream, "user_id", ["event_id", "event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from first_seen").toPandas()
    want_keys = {r["user_id"] for r in batch.select("user_id").distinct().collect()}
    assert set(got.user_id) == want_keys
    assert got.user_id.is_unique  # exactly one row per key


def test_streaming_running_totals(spark, events_stream_dir, tmp_path):
    batch = spark.read.parquet(events_stream_dir)
    stream = spark.readStream.schema(batch.schema).parquet(events_stream_dir)
    out = streaming_running_totals(stream, "user_id", "value")
    q = (
        out.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from running_totals").toPandas().set_index("user_id")
    want = batch.groupBy("user_id").count().toPandas().set_index("user_id")
    # single micro-batch -> running totals equal batch counts
    for uid, row in want.iterrows():
        assert got.loc[uid, "running_count"] == row["count"]
