"""Scaling-efficiency evidence (BASELINE.json north_rule).

Runs the flagship PIP-join pipeline over a deterministic synthetic docs
table at two parallelism levels (local[8] vs local[32] — the sandbox
stand-in for N vs 4N executors) and reports throughput (docs/sec) at
both plus efficiency = (throughput@32 / throughput@8) / 4.

The timed job is the join itself over materialized input: envelope +
cell_id are persisted table columns in the engine's data model
(FIXTURES.md F1, derived once at ingest), so deriving them is not part
of the recurring query cost. The docs table is generated distributed
(spark.range) — a 100 TB table arrives in thousands of splits, not the
1-2 a toy parquet file would give.

Usage:
  python scripts/scaling_bench.py [n_docs]              # both levels
  python -c "from scripts.scaling_bench import run_once; run_once(8, 200_000_000)"
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(cpus: int, n_docs: int, cached: bool = True) -> dict:
    from pyspark.sql import functions as F

    from pyogrio_spark.functions.geo import cell_id_column
    from pyogrio_spark.operators.spatial_join import point_in_polygon_join, zones_cell_cover
    from pyogrio_spark.queries import GEO_RES, LAT_EXPR, LON_EXPR, _zones_pd
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"scaling_{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(F.col("id").alias("doc_id"))
    docs = docs.withColumn("xmin", F.expr(LON_EXPR)).withColumn("ymin", F.expr(LAT_EXPR))
    docs = docs.withColumn("cell_id", cell_id_column("xmin", "ymin", GEO_RES))
    if cached:
        # in-memory columnar input: the timed region is a cache scan +
        # join — in ONE JVM the cache read is bounded by the shared
        # memory bus, so 8->32-thread efficiency reflects the bus, not
        # the plan (see BENCH/BASELINE.md round-3 notes).
        docs = docs.cache()
        docs.count()
    # cached=False: the scan stage synthesizes rows in whole-stage
    # codegen (pure per-core arithmetic, no shared-bus traffic) — the
    # sandbox stand-in for a real cluster's parquet-decode scan stage,
    # where decode is per-core CPU work local to each executor.

    cover = zones_cell_cover(spark, _zones_pd(), res=GEO_RES, zone_key="zone_id")
    # steady-state protocol: execute the identical join once untimed so
    # BOTH widths are measured with codegen classes compiled and the JVM
    # JIT warm. Without this, whichever width runs first in a session
    # eats the compile cost and the efficiency ratio measures janino/C2,
    # not the plan (measured: cold 8-core 16.1 s vs warm 4.9 s on the
    # same input). Steady-state throughput is the relevant number for a
    # long-running 100 TB job anyway.
    point_in_polygon_join(docs, cover, zone_key="zone_id", keep_doc_cols=["doc_id"]).count()
    t0 = time.perf_counter()
    out = point_in_polygon_join(docs, cover, zone_key="zone_id", keep_doc_cols=["doc_id"])
    n_pairs = out.count()
    wall = time.perf_counter() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n_docs, "pairs": n_pairs, "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_once_shuffle(cpus: int, n_docs: int) -> dict:
    """Shuffle-heavy counterpart: exact dedup where ~every key is
    distinct — no broadcast, no map-side combine relief; the full row
    stream crosses the wire. This is the worst-case shuffle the engine's
    groupBy-family operators (dedup, zonal, budget) can see."""
    from pyspark.sql import functions as F

    from pyogrio_spark.operators.dedup import exact_dedup
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    # shuffle partition COUNT is held fixed across cluster sizes: it is
    # a data-sized tuning knob, not a cluster property (a real cluster
    # job keeps spark.sql.shuffle.partitions as executors scale), so
    # tying it to 2*cpus would conflate per-partition agg-state size
    # with the core-scaling signal. NB: measured run-to-run variance on
    # this GC-bound job is ~2x either way — see BENCH/BASELINE.md §2.
    spark = get_spark(
        f"scaling_shuffle_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(
        F.col("id").alias("doc_id"),
        # ~2% duplicate content, rest unique: realistic dedup shape with
        # no combine relief (every group is size 1-2)
        F.concat(F.lit("doc "), ((F.col("id") * 48271) % (n_docs * 49 // 50)).cast("string")).alias("text"),
    ).cache()
    docs.count()
    t0 = time.perf_counter()
    n_groups = exact_dedup(docs).count()
    wall = time.perf_counter() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n_docs, "groups": n_groups, "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_once_knn(cpus: int, n_docs: int) -> dict:
    """Iterative-operator counterpart: kNN join of 100k probes against
    the full corpus (cell-window expansion rounds, density distance cut,
    window ranking).

    Index resolution is matched to corpus density — cells should hold
    O(100) docs (res ~ log4(n_docs/100)); at res 7 a 200M-doc corpus
    piles 12k docs into every cell and each doc matches ~55 probe
    windows, a bandwidth-bound 11-billion-row expansion. At res 10 the
    same join expands ~1:1."""
    import math

    from pyspark.sql import functions as F

    from pyogrio_spark.functions.geo import cell_id_column
    from pyogrio_spark.operators.knn import knn_join
    from pyogrio_spark.queries import LAT_EXPR, LON_EXPR
    from pyogrio_spark.session import get_spark

    res = max(5, min(14, int(math.log(max(n_docs, 1) / 100, 4)) + 1))

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"scaling_knn_{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(F.col("id").alias("doc_id"))
    docs = docs.withColumn("xmin", F.expr(LON_EXPR)).withColumn("ymin", F.expr(LAT_EXPR))
    docs = docs.withColumn("cell_id", cell_id_column("xmin", "ymin", res)).cache()
    docs.count()
    probes = docs.filter(F.col("doc_id") < 100_000).select(
        F.col("doc_id").alias("probe_id"), F.col("xmin").alias("lon"), F.col("ymin").alias("lat")
    )
    t0 = time.perf_counter()
    n_out = knn_join(probes, docs, k=10, res=res).count()
    wall = time.perf_counter() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n_docs, "knn_rows": n_out, "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_once_asof(cpus: int, n_docs: int, plan: str = "distributed") -> dict:
    """AS-OF join counterpart: n_docs left rows against a 5-key x 2400-row
    rate dimension — the FEW/HOT-key case where the per-key window plan
    serializes on 5 reducers and the two-phase plan spreads each key
    over range partitions."""
    from pyspark.sql import functions as F

    from pyogrio_spark.operators.asof_join import asof_join, asof_join_distributed
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"scaling_asof_{plan}_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    left = spark.range(n_docs, numPartitions=4 * cpus).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("key"),
        ((F.col("id") * 48271) % 8_640_000_000).alias("ts"),
    ).cache()
    left.count()
    rates = spark.range(2400).select(F.col("id").alias("h")).crossJoin(
        spark.range(5).select(F.col("id").alias("key"))
    ).select("key", (F.col("h") * 3_600_000).alias("rts"), (F.col("h") * 13 + F.col("key")).cast("double").alias("rate"))
    fn = asof_join_distributed if plan == "distributed" else asof_join
    t0 = time.perf_counter()
    out = fn(left, rates, ["key"], left_ts="ts", right_ts="rts", right_vals=["rate"])
    # sum(rate), not count(): count() lets Catalyst prune the window fill
    # entirely and times nothing (see BENCH notes on count-pruning)
    agg = out.agg(F.sum("rate").alias("s"), F.count("*").alias("n")).first()
    n_out = agg["n"]
    wall = time.perf_counter() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n_docs, "rows": n_out, "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_once_asof_window(cpus: int, n_docs: int) -> dict:
    return run_once_asof(cpus, n_docs, plan="window")


def run_once_chunk(cpus: int, n_docs: int) -> dict:
    """Round-5 operator family: document chunking + global packing.
    The chunk stage is a pure-codegen zero-shuffle map (split/sequence/
    explode/slice); pack_chunks_global adds the two-phase rank (one
    range exchange + partition-local window). Synthesized ~40-token
    docs; per-row work is JVM string splitting + array slicing."""
    from pyspark.sql import functions as F

    from pyogrio_spark.operators.chunking import chunk_documents, pack_chunks_global
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"scaling_chunk_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(
        F.col("id").alias("doc_id"),
        # ~40 tokens/doc, content varies by id so nothing constant-folds
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"w{j}_"), ((F.col("id") * (48271 + j)) % 997).cast("string")) for j in range(40)],
        ).alias("text"),
    )
    def run():
        out = pack_chunks_global(chunk_documents(docs, 32, 8), 128, 32)
        # materialize EVERY column (count() would let Catalyst prune the
        # chunk_text slice/join work — the expensive part)
        row = out.select(
            F.count("*").alias("n"),
            F.sum(F.length("chunk_text")).alias("chars"),
            F.sum("global_idx").alias("gsum"),
            F.max("pack_id").alias("pmax"),
        ).collect()[0]
        return row["n"], row["chars"]
    n_chunks, chars = run()  # warm pass (codegen compile + JIT)
    t0 = time.perf_counter()
    n2, chars2 = run()
    wall = time.perf_counter() - t0
    spark.stop()
    assert (n2, chars2) == (n_chunks, chars)
    return {"cpus": cpus, "docs": n_docs, "chunks": n_chunks, "chunk_chars": chars,
            "wall_sec": round(wall, 3), "docs_per_sec": round(n_docs / wall, 1)}



def run_once_linededup(cpus: int, n_docs: int) -> dict:
    """Round-6 operator family: corpus-global line dedup. Shape under
    test: zero-shuffle segmentation, md5-keyed bigint-min keeper
    groupBy (map-side combine), hash-join back, doc-keyed reassembly —
    three shuffles over the line stream. Synthesized ~32-token docs
    where ~25% of 8-word lines repeat across docs (every 4th line slot
    draws from a small shared pool), so the keeper join does real
    elimination work."""
    from pyspark.sql import functions as F

    from pyogrio_spark.operators.dedup import line_dedup_global
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"scaling_linededup_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # 4 lines/doc x 8 words; line slot 3 of each doc comes from a pool
    # of 50k shared lines -> global duplicates, the rest unique per doc
    parts = []
    for li in range(4):
        seed = 48271 + li
        if li == 3:
            words = [F.concat(F.lit(f"p{j}_"), ((F.col("id") * 16807) % 50_000).cast("string")) for j in range(8)]
        else:
            words = [F.concat(F.lit(f"u{li}_{j}_"), ((F.col("id") * seed + j) % (1 << 40)).cast("string")) for j in range(8)]
        parts.extend(words)
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *parts).alias("text")
    )

    def run():
        out = line_dedup_global(docs, line_words=8)
        row = out.select(
            F.count("*").alias("n"),
            F.sum(F.length("text")).alias("chars"),
            F.sum("n_kept").alias("kept"),
            F.sum("n_lines").alias("lines"),
        ).collect()[0]
        return row["n"], row["chars"], row["kept"], row["lines"]

    res = run()  # warm pass (codegen compile + JIT)
    t0 = time.perf_counter()
    res2 = run()
    wall = time.perf_counter() - t0
    spark.stop()
    assert res == res2
    return {"cpus": cpus, "docs": n_docs, "rows": res[0], "kept_lines": res[2],
            "total_lines": res[3], "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_once_minhash(cpus: int, n_docs: int) -> dict:
    """CPU-bound counterpart: MinHash signatures (16-perm Carter-Wegman
    over one md5 per 3-shingle) on synthesized ~12-word docs. Per-row
    work is dominated by JVM md5 + codegen string assembly — the regime
    where core count, not the shared memory bus, is the limit. This is
    the scaling-evidence job for the engine's hash-heavy operator
    family (minhash/simhash/winnowing/fingerprinting); the scan-bound
    flagship join's single-JVM ceiling is reported separately (see
    BENCH/BASELINE.md round-3 notes)."""
    from pyspark.sql import functions as F

    from pyogrio_spark.operators.dedup import minhash_signature
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"scaling_minhash_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(12)),
        lambda i: F.conv(
            (F.pmod(F.col("id") * 48271 + i * 2_654_435_761, F.lit(1 << 20))).cast("string"), 10, 36
        ),
    )
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    ).cache()
    docs.count()
    # steady-state protocol (same rationale as run_once): warm pass first
    minhash_signature(docs).agg(F.bit_xor(F.xxhash64("sig"))).collect()
    t0 = time.perf_counter()
    sig = minhash_signature(docs)
    agg = sig.agg(F.bit_xor(F.xxhash64("sig")).alias("x"), F.count("*").alias("n")).first()
    wall = time.perf_counter() - t0
    spark.stop()
    return {"cpus": cpus, "docs": n_docs, "rows": agg["n"], "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_once_scrub(cpus: int, n_docs: int) -> dict:
    """Round-6 operator family: corpus scrubbing (normalize + PII
    redaction). Pure zero-shuffle map whose per-row cost is JVM regex
    scanning — the text-cleaning regime where core count is the only
    limit. Docs synthesized with planted PII (~1 email / phone / IP per
    row) so every regex actually matches and replaces."""
    from pyspark.sql import functions as F

    from pyogrio_spark.functions.scrub import normalize_text, redact_pii
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"scaling_scrub_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = F.col("id")
    s = lambda c: c.cast("string")  # noqa: E731
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("some  body “text” with   filler words — user"), s(d),
            F.lit("@mail-"), s(d % 97), F.lit(".example.com tail 415-555-"),
            F.lpad(s(d % 10000), 4, "0"), F.lit(" from 10."), s(d % 256),
            F.lit(".0."), s(d % 100), F.lit(" done"),
        ).alias("text"),
    ).cache()
    docs.count()

    def run():
        out = docs.select(redact_pii(normalize_text(F.col("text"))).alias("t"))
        row = out.agg(F.sum(F.length("t")).alias("chars"), F.count("*").alias("n")).first()
        return row["n"], row["chars"]

    res = run()  # steady-state protocol: warm pass (codegen + JIT)
    t0 = time.perf_counter()
    res2 = run()
    wall = time.perf_counter() - t0
    spark.stop()
    assert res == res2
    return {"cpus": cpus, "docs": n_docs, "rows": res[0], "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1)}


def run_once_tokenize(cpus: int, n_docs: int) -> dict:
    """Round-7 operator family: greedy subword segmentation after the
    single-pass mapInPandas rework (tokenizer.py tokenize_greedy).
    Shape under test: corpus word explode (zero-shuffle), distinct-word
    aggregation (one shuffle, map-side combine), ONE Arrow-batched
    segmentation stage over the dimension-sized distinct table, hash
    join back onto the word stream, then a column-consuming aggregate.
    The Python stage is bounded by distinct words, not corpus size, so
    the scaling axis is the JVM explode/join/aggregate volume — the
    100 TB shape.

    SINGLE-BOX CONTROL: string-heavy stages are memory-bandwidth-bound
    in one JVM (the round-3 shared-bus finding that made the pip family
    use arithmetic-only synthesis). To separate the operator's plan
    from the host's bus ceiling, this runner also times ``synth_sec`` —
    the bare corpus string synthesis+scan with NO tokenizer stage. The
    honest scaling statement is the ratio of ratios: if full-pipeline
    N->4N efficiency equals the synthesis efficiency, the tokenizer
    plan adds zero scaling penalty beyond the shared bus (which a real
    cluster's per-node buses do not have).

    Heap/GC notes (measured): a 48g heap is wildly unstable here (2M
    docs: 26s first run then 60-360s repeats — GC/paging thrash against
    co-tenants); 16g is stable. GC threads are pinned to the width —
    JVM defaults size GC worker pools to the MACHINE's 32 cores, which
    silently lends a local[2] run 32 collector threads for its
    allocation-heavy stages and deflates measured efficiency.
    """
    from pyspark.sql import functions as F

    from pyogrio_spark.operators.tokenizer import tokenize_greedy
    from pyogrio_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    spark = get_spark(
        f"scaling_tok_{cpus}", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # pin GC worker pools to the width (see docstring)
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={cpus} -XX:ConcGCThreads={max(1, cpus // 4)}"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.range(n_docs, numPartitions=4 * cpus).select(
        F.col("id").alias("doc_id"),
        # 24 words/doc from a 200k-value pool: corpus word stream is
        # 24x n_docs while the distinct-word table (and therefore the
        # Python segmentation stage) stays dimension-sized — the Zipf
        # shape the operator is designed for. This also keeps the
        # measured scaling axis on the JVM explode/shuffle/join volume:
        # Python workers are separate PROCESSES not capped by local[N],
        # so a Python-heavy stage lets a narrow width borrow host cores
        # and deflates measured efficiency (seen at 0.69 with a 1M-word
        # pool at only 12 words/doc).
        F.concat_ws(
            " ",
            *[((F.col("id") * (48271 + j)) % 200_000).cast("string") for j in range(24)],
        ).alias("text"),
    )
    vocab = [str(d) for d in range(10)] + [
        f"{a}{b}" for a in "0123456789" for b in "0123456789"
    ]

    def run():
        out = tokenize_greedy(docs, vocab)
        row = out.select(
            F.count("*").alias("n"),
            F.sum(F.length("token")).alias("chars"),
            F.sum("tok_pos").alias("psum"),
        ).collect()[0]
        return row["n"], row["chars"], row["psum"]

    a = run()  # warm pass (codegen compile + JIT + Arrow worker spin-up)
    t0 = time.perf_counter()
    b = run()
    wall = time.perf_counter() - t0
    # shared-bus control: bare synthesis+scan of the same corpus, no
    # tokenizer stages at all (see docstring)
    docs.select(F.sum(F.length("text"))).collect()  # warm
    t0 = time.perf_counter()
    docs.select(F.sum(F.length("text"))).collect()
    synth = time.perf_counter() - t0
    spark.stop()
    assert a == b
    return {"cpus": cpus, "docs": n_docs, "tokens": a[0], "wall_sec": round(wall, 3),
            "docs_per_sec": round(n_docs / wall, 1),
            "synth_sec": round(synth, 3)}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    job = sys.argv[2] if len(sys.argv) > 2 else "pip"
    runner = {"pip": run_once, "dedup": run_once_shuffle, "knn": run_once_knn,
              "asof": run_once_asof, "asof_window": run_once_asof_window,
              "minhash": run_once_minhash, "scrub": run_once_scrub,
              "chunk": run_once_chunk, "linededup": run_once_linededup,
              "tokenize": run_once_tokenize}[job]
    r8 = runner(8, n_docs)
    r32 = runner(32, n_docs)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    print(json.dumps({"job": job, "n8": r8, "n32": r32, "scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
