"""S10 production sink paths: checkpointed streaming parquet sink and
foreachBatch micro-batch fan-out — verified by roundtrip equality against
the batch read of the same source (SURVEY.md §2.1 S9/S10, §2.9 T9)."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from aws_etl_microservice_redshift_datalake_spark.scratch import process_scratch
from aws_etl_microservice_redshift_datalake_spark.sources.io import load_table
from aws_etl_microservice_redshift_datalake_spark.streaming.streams import (
    stream_events,
    stream_foreach_batch,
    stream_to_parquet,
)

SCRATCH = process_scratch()


def test_stream_to_parquet_roundtrip(spark):
    tag = uuid.uuid4().hex[:8]
    out = f"{SCRATCH}/sink-{tag}"
    ckpt = f"{SCRATCH}/sink-ckpt-{tag}"
    try:
        sdf = stream_events(spark, SF_SMALL).select("event_id", "user_id", "event_type")
        stream_to_parquet(sdf, out, ckpt, partition_cols=["event_type"])
        got = spark.read.parquet(out)
        want = load_table(spark, SF_SMALL, "events")
        assert got.count() == want.count()
        # partitionBy layout: event_type is a hive partition column
        assert got.filter(F.col("event_type") == "click").count() == want.filter(
            F.col("event_type") == "click"
        ).count()
        assert set(got.columns) == {"event_id", "user_id", "event_type"}
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_foreach_batch_sink(spark):
    tag = uuid.uuid4().hex[:8]
    ckpt = f"{SCRATCH}/feb-ckpt-{tag}"
    seen: list[tuple[int, int]] = []

    def sink(batch_df, batch_id):
        seen.append((batch_id, batch_df.count()))

    try:
        sdf = stream_events(spark, SF_SMALL).filter(F.col("value") > 0)
        stream_foreach_batch(sdf, sink, ckpt)
        want = load_table(spark, SF_SMALL, "events").filter(F.col("value") > 0).count()
        assert sum(n for _, n in seen) == want
        assert len(seen) >= 1
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_multi_batch_incremental_processing(spark):
    """The streaming source is genuinely incremental: with the events table
    split into 4 files and maxFilesPerTrigger=1, availableNow processes 4
    separate micro-batches whose complete-mode aggregate still equals the
    batch twin exactly — state carries across batches."""
    import uuid as _uuid
    from pyspark.sql import functions as F

    tag = _uuid.uuid4().hex[:8]
    srcdir = f"{SCRATCH}/multibatch-{tag}"
    ckpt = f"{SCRATCH}/multibatch-ckpt-{tag}"
    try:
        ev = load_table(spark, SF_SMALL, "events")
        ev.repartition(4).write.parquet(srcdir)

        # the staged copy is already µs timestamps — stream it with the
        # materialized schema (no nanos conversion needed)
        sdf = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(srcdir)
        )
        agg = sdf.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s")
        )
        name = "mb" + tag
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
        progress = q.recentProgress
        assert len([p for p in progress if p["numInputRows"] > 0]) >= 4, (
            "expected >= 4 non-empty micro-batches"
        )
        got = {r["event_type"]: (r["n"], r["s"]) for r in spark.table(name).collect()}
        want = {
            r["event_type"]: (r["n"], r["s"])
            for r in ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("s"))
            .collect()
        }
        assert got == want
    finally:
        shutil.rmtree(srcdir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_streaming_cdc_upsert_into_parquet_state(spark):
    """The streaming MERGE pattern end-to-end: a multi-batch event stream is
    applied through foreachBatch as incremental upserts into a parquet
    state table (latest value per user, newer event_id wins), and the final
    state must equal the batch answer computed over the whole source.

    This is the CDC-apply shape a Redshift-bound service runs (stage the
    micro-batch, MERGE into the target): per batch, reduce to one row per
    key, full-outer join against current state with recency-based
    resolution, atomic directory swap. Batch-vs-stream equality holds
    regardless of how files split into micro-batches because the merge rule
    is associative and commutative over batches (max_by event_id)."""
    import os

    tag = uuid.uuid4().hex[:8]
    src_dir = f"{SCRATCH}/cdc-src-{tag}"
    state = f"{SCRATCH}/cdc-state-{tag}"
    ckpt = f"{SCRATCH}/cdc-ckpt-{tag}"
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "value"
    )
    ev.repartition(4).write.parquet(src_dir)  # 4 files → 4 micro-batches

    def upsert(batch_df, batch_id):
        updates = batch_df.groupBy("user_id").agg(
            F.max_by("value", "event_id").alias("value"),
            F.max("event_id").alias("event_id"),
        )
        if os.path.exists(state):
            cur = spark.read.parquet(state).alias("t")
            u = updates.alias("s")
            newer = F.col("s.event_id") > F.col("t.event_id")
            merged = cur.join(u, F.col("t.user_id") == F.col("s.user_id"), "full_outer").select(
                F.coalesce(F.col("s.user_id"), F.col("t.user_id")).alias("user_id"),
                F.when(F.col("t.event_id").isNull() | newer, F.col("s.value"))
                .otherwise(F.coalesce(F.col("t.value"), F.col("s.value")))
                .alias("value"),
                F.greatest(F.col("s.event_id"), F.col("t.event_id")).alias("event_id"),
            )
        else:
            merged = updates.select("user_id", "value", "event_id")
        staged = state + ".staging"
        merged.write.mode("overwrite").parquet(staged)
        old = state + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(state):
            os.rename(state, old)
        os.rename(staged, state)
        shutil.rmtree(old, ignore_errors=True)

    try:
        sdf = (
            spark.readStream.schema("event_id BIGINT, user_id BIGINT, value DOUBLE")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        stream_foreach_batch(sdf, upsert, ckpt)

        got = spark.read.parquet(state).orderBy("user_id").collect()
        want = (
            ev.groupBy("user_id")
            .agg(
                F.max_by("value", "event_id").alias("value"),
                F.max("event_id").alias("event_id"),
            )
            .orderBy("user_id")
            .collect()
        )
        assert [r.asDict() for r in got] == [r.asDict() for r in want]
    finally:
        for p in (src_dir, state, ckpt, state + ".staging", state + ".old"):
            shutil.rmtree(p, ignore_errors=True)


def test_checkpoint_resume_processes_only_new_files(spark):
    """Exactly-once incremental restart: a checkpointed availableNow run
    drains the source and STOPS; more files then land; a second run with
    the SAME checkpoint must process only the new files — output has no
    duplicates and exactly covers the union. This is the contract that lets
    a scheduled (cron-style) streaming ETL resume where it left off."""
    import os

    tag = uuid.uuid4().hex[:8]
    src = f"{SCRATCH}/resume-src-{tag}"
    out = f"{SCRATCH}/resume-out-{tag}"
    ckpt = f"{SCRATCH}/resume-ckpt-{tag}"
    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "value")
    first = ev.filter(F.col("event_id") < 500)
    second = ev.filter(F.col("event_id") >= 500)
    try:
        first.coalesce(2).write.parquet(src)
        sdf = spark.readStream.schema(
            "event_id BIGINT, user_id BIGINT, value DOUBLE"
        ).parquet(src)
        stream_to_parquet(sdf, out, ckpt)
        n1 = spark.read.parquet(out).count()
        assert n1 == first.count()

        # late-arriving files land in the same source directory
        second.coalesce(2).write.mode("append").parquet(src)
        sdf2 = spark.readStream.schema(
            "event_id BIGINT, user_id BIGINT, value DOUBLE"
        ).parquet(src)
        stream_to_parquet(sdf2, out, ckpt)

        got = spark.read.parquet(out)
        assert got.count() == ev.count(), "resume must add exactly the new rows"
        assert got.select("event_id").distinct().count() == ev.count(), (
            "exactly-once: no duplicated event_ids after resume"
        )
    finally:
        for p in (src, out, ckpt):
            shutil.rmtree(p, ignore_errors=True)


def test_watermark_stream_tz_scoped_and_correct(spark):
    """The watermark helper's UTC pin must be scoped: after a watermark
    query runs, the caller session's timezone is restored, and the results
    are identical regardless of the caller tz (sink holds only NTZ values
    — the round-4 fix moved the NTZ cast inside the stream graph)."""
    from tests.conftest import SF_SMALL

    import aws_etl_microservice_redshift_datalake_spark as engine

    qs = engine.all_queries()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        rows_ny = sorted(map(tuple, qs["q_stream_watermark"](spark, SF_SMALL).collect()))
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York", (
            "UTC pin leaked out of the stream run"
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        rows_utc = sorted(map(tuple, qs["q_stream_watermark"](spark, SF_SMALL).collect()))
        assert rows_ny == rows_utc, "stream results depend on caller session tz"
        assert len(rows_ny) > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
