"""Streaming hourly rollup == batch result; watermark drops late rows."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from proj_spark import streaming


@pytest.fixture(scope="module")
def spark():
    from proj_spark.session import get_spark
    s = get_spark("test_streaming", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    # split the batch table into several files => several micro-batches
    (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(4).write.mode("overwrite").parquet(src))
    for extra in os.listdir(src):
        if extra.startswith("_"):
            os.remove(os.path.join(src, extra))

    stream = streaming.hourly_rollup(streaming.read_event_stream(spark, src))
    streaming.run_to_memory(stream, "rollup_complete", mode="complete")
    got = spark.table("rollup_complete")

    batch = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.sum("value"), 2).alias("sum_value"))
             .select(F.col("w.start").alias("hour_start"), "event_type",
                     "n_events", "sum_value"))
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b and len(g) > 0


def test_watermark_closed_windows_are_final(spark, tmp_path):
    """Append-mode watermark guarantee: once the watermark passes a window
    and it is emitted, a later-arriving row for that window cannot re-emit
    or modify it (exactly-once window finalization)."""
    flat = str(tmp_path / "flat")
    os.makedirs(flat)

    def put(i, rows):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts_s string, user_id long, event_type string, value double, payload string"
        ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s") \
         .select("event_id", "ts", "user_id", "event_type", "value", "payload")
        d = str(tmp_path / f"w{i}")
        df.coalesce(1).write.parquet(d)
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                dst = os.path.join(flat, f"{i:03d}.parquet")
                shutil.copy(os.path.join(d, fn), dst)
                os.utime(dst, (1700000000 + i * 3600,) * 2)

    put(0, [(1, "2024-01-01 10:15:00", 1, "click", 1.0, ""),
            (2, "2024-01-01 10:45:00", 2, "click", 2.0, "")])
    # advances event time to 14:00; the 12:00 watermark takes effect (and
    # closes the 10:00 window) one micro-batch later
    put(1, [(3, "2024-01-01 14:00:00", 3, "view", 7.0, "")])
    put(2, [(6, "2024-01-01 14:30:00", 6, "view", 1.0, "")])
    # a 10:30 straggler AFTER the 10:00 window was finalized
    put(3, [(4, "2024-01-01 10:30:00", 4, "click", 100.0, "")])
    # push the clock so any (incorrectly) resurrected window would flush
    put(4, [(5, "2024-01-01 20:00:00", 5, "view", 9.0, "")])

    stream = streaming.hourly_rollup(
        streaming.read_event_stream(spark, flat), watermark="2 hours")
    streaming.run_to_memory(stream, "rollup_append", mode="append")
    rows = [(str(r.hour_start), r.event_type, r.n_events, r.sum_value)
            for r in spark.table("rollup_append").collect()]
    ten = [r for r in rows if r[0] == "2024-01-01 10:00:00"]
    # exactly one finalized row for the 10:00 window, containing only the
    # two pre-watermark events — the straggler neither re-emits nor mutates
    assert ten == [("2024-01-01 10:00:00", "click", 2, 3.0)], rows


def test_sessionize_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: two bursts separated by more
    than the gap close into two sessions for the same user."""
    import pandas as pd
    from proj_spark.streaming import read_event_stream, sessionize, run_to_memory

    src = tmp_path / "sess_src"
    src.mkdir()
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    for i in range(5):  # burst 1
        rows.append((i, base + pd.Timedelta(minutes=i), 7, "click", 1.0, ""))
    for i in range(3):  # burst 2, 3 hours later
        rows.append((100 + i, base + pd.Timedelta(hours=3, minutes=i), 7,
                     "click", 2.0, ""))
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "payload"])
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(src))

    stream = read_event_stream(spark, str(src), max_files_per_trigger=100)
    sess = sessionize(stream, gap_minutes=30)
    run_to_memory(sess, "sessions_out", mode="append")
    got = spark.table("sessions_out").toPandas()
    # the first burst closes when the second arrives (gap exceeded);
    # the second stays open (no further data) -> exactly one closed session
    assert len(got) == 1
    assert got.iloc[0]["n_events"] == 5
    assert got.iloc[0]["sum_value"] == 5.0


def test_streaming_dedup_drops_replays(spark, tmp_path):
    """streaming_dedup keeps exactly the first arrival per event_id across
    micro-batches: a replayed/duplicated feed converges to the batch
    distinct set."""
    src = str(tmp_path / "dup_events")
    base = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    # duplicate every row (replay) and split across files/micro-batches
    base.union(base).repartition(4).write.mode("overwrite").parquet(src)
    for extra in os.listdir(src):
        if extra.startswith("_"):
            os.remove(os.path.join(src, extra))

    # horizon must cover the fixture's whole ts span: the files are not
    # time-ordered, so with a short watermark rows arriving in a later
    # micro-batch but timestamped before it would be dropped as late
    deduped = streaming.streaming_dedup(
        streaming.read_event_stream(spark, src), watermark="8760 hours")
    streaming.run_to_memory(deduped, "dedup_out", mode="append")
    got = spark.table("dedup_out")
    assert got.count() == got.select("event_id").distinct().count() == 500


def test_tile_rollup_stream_equals_batch(spark, tmp_path):
    """Streaming geospatial rollup: per-tile-per-hour counts over the
    micro-batched feed equal the identical batch expression."""
    src = str(tmp_path / "tile_events")
    (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(4).write.mode("overwrite").parquet(src))
    for extra in os.listdir(src):
        if extra.startswith("_"):
            os.remove(os.path.join(src, extra))

    stream = streaming.tile_rollup(streaming.read_event_stream(spark, src))
    streaming.run_to_memory(stream, "tile_rollup_complete", mode="complete")
    got = spark.table("tile_rollup_complete")

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    lon = ((F.col("user_id") * F.lit(2654435761) + F.col("event_id") * 40503)
           % 36000000) / 100000.0 - 180.0
    lat = ((F.col("user_id") * F.lit(2246822519) + F.col("event_id") * 10369)
           % 17000000) / 100000.0 - 85.0
    pi = 3.141592653589793
    batch = (ev.withColumn("tx", F.floor((lon + 180.0) / 360.0 * 256.0).cast("long"))
               .withColumn("ty", F.floor(
                   (1.0 - F.log(F.tan(pi / 4.0 + F.radians(lat) / 2.0)) / pi)
                   / 2.0 * 256.0).cast("long"))
               .groupBy(F.window("ts", "1 hour").alias("w"), "tx", "ty")
               .agg(F.count("*").alias("n_events"))
               .select(F.col("w.start").alias("hour_start"), "tx", "ty",
                       "n_events"))
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert g == b and len(g) > 100


def test_streaming_minhash_equals_batch(spark, tmp_path):
    """Streaming MinHash-band near-dup: the candidate-pair set discovered
    incrementally over micro-batches equals the batch LSH banding's
    candidate set on the same corpus, and the stateless per-row band keys
    equal textops' audited explode+groupBy banding value-for-value."""
    from proj_spark import querylib, textops

    querylib.register_views(spark, "/root/testdata/sf0.001")
    docs = spark.sql(
        f"WITH {textops.DUP_DOCS_CTE} SELECT doc_id, text FROM dup_docs"
    ).withColumn(
        "ts", F.expr("timestamp'2024-01-01 00:00:00' "
                     "+ make_interval(0, 0, 0, 0, 0, CAST(doc_id % 60 AS INT), 0)"))

    # 1) band keys: per-row expressions == textops' explode + groupBy agg
    sig_static = streaming.minhash_band_keys(docs)
    textops.ensure_sh_sets_view(spark, "/root/testdata/sf0.001")
    sh = spark.table(textops.SH_SETS_VIEW)
    v = (F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
         % textops.MINHASH_P).alias("v")
    minhash = sh.select("doc_id", v).groupBy("doc_id").agg(*[
        F.min((F.lit(a) * F.col("v") + F.lit(b)) % textops.MINHASH_P)
         .alias(f"mh{p}") for p, (a, b) in enumerate(textops.MINHASH_AB)])
    bk = [F.concat_ws("|", *[F.col(f"mh{4 * b + r}").cast("string")
                             for r in range(4)]) for b in range(4)]
    sig_textops = minhash.select(
        "doc_id", F.posexplode(F.array(*bk)).alias("band", "bkey"))
    a = {tuple(r) for r in sig_static.select("doc_id", "band", "bkey").collect()}
    b = {tuple(r) for r in sig_textops.collect()}
    assert a == b and len(a) > 1000

    # 2) stream == batch: candidate pairs discovered across micro-batches
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    for extra in os.listdir(src):
        if extra.startswith("_"):
            os.remove(os.path.join(src, extra))
    stream_docs = (spark.readStream.schema(docs.schema)
                   .option("maxFilesPerTrigger", 1).parquet(src))
    pairs = streaming.streaming_minhash_pairs(stream_docs,
                                              watermark="8760 hours",
                                              horizon_ms=10**12)
    streaming.run_to_memory(pairs, "minhash_pairs_out", mode="append")
    got = {(r.id1, r.id2) for r in spark.table("minhash_pairs_out").collect()}

    sj = sig_static.select("doc_id", "band", "bkey")
    expected = {(r.id1, r.id2) for r in
                (sj.alias("x").join(
                    sj.alias("y"),
                    (F.col("x.band") == F.col("y.band"))
                    & (F.col("x.bkey") == F.col("y.bkey"))
                    & (F.col("x.doc_id") < F.col("y.doc_id")))
                 .select(F.col("x.doc_id").alias("id1"),
                         F.col("y.doc_id").alias("id2"))
                 .distinct()).collect()}
    assert got == expected and len(expected) > 50
