"""S10 production sink paths: checkpointed streaming parquet sink and
foreachBatch micro-batch fan-out — verified by roundtrip equality against
the batch read of the same source (SURVEY.md §2.1 S9/S10, §2.9 T9)."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from aws_etl_microservice_redshift_datalake_spark.sources.io import load_table
from aws_etl_microservice_redshift_datalake_spark.streaming.streams import (
    SCRATCH,
    stream_events,
    stream_foreach_batch,
    stream_to_parquet,
)


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
