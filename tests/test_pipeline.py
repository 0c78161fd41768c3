"""EtlJob orchestration: the COPY → transform → UNLOAD flow end-to-end,
verified by re-reading the unloaded lake layout against a direct query."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F

from aws_etl_microservice_redshift_datalake_spark.pipeline import EtlJob
from aws_etl_microservice_redshift_datalake_spark.sources.io import load_table

from tests.conftest import SF_MED

SCRATCH = "/root/repo/.tmp"


def test_etl_job_end_to_end(spark):
    out = f"{SCRATCH}/job-{uuid.uuid4().hex[:8]}"
    try:
        job = (
            EtlJob("quarterly_revenue")
            .ingest("li", lambda s: load_table(s, SF_MED, "lineitem"))
            .ingest("ord", lambda s: load_table(s, SF_MED, "orders"))
            .transform(
                "rev",
                """
                SELECT o.o_orderpriority,
                       l.l_returnflag,
                       COUNT(*) AS n_items,
                       ROUND(SUM(l.l_quantity), 2) AS total_qty
                FROM li l JOIN ord o ON l.l_orderkey = o.o_orderkey
                GROUP BY o.o_orderpriority, l.l_returnflag
                """,
            )
            .unload("rev", out, partition_cols=["l_returnflag"])
        )
        report = job.run(spark)

        assert [s.kind for s in report.stages] == ["ingest", "ingest", "transform", "sink"]
        sink = report.stages[-1]
        assert sink.rows and sink.rows > 0

        # lake roundtrip equals the direct query
        back = spark.read.parquet(out)
        direct = (
            load_table(spark, SF_MED, "lineitem")
            .join(
                load_table(spark, SF_MED, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority", "l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            )
        )
        got = {
            (r["o_orderpriority"], r["l_returnflag"]): (r["n_items"], r["total_qty"])
            for r in back.collect()
        }
        want = {
            (r["o_orderpriority"], r["l_returnflag"]): (r["n_items"], r["total_qty"])
            for r in direct.collect()
        }
        assert got == want
        assert report.total_seconds > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_checkpoint_view_counts(spark):
    job = (
        EtlJob("ck")
        .ingest("nat", lambda s: load_table(s, SF_MED, "nation"))
        .transform("big", "SELECT * FROM nat WHERE n_nationkey >= 10")
        .checkpoint_view("big")
    )
    report = job.run(spark)
    ck = report.stages[-1]
    assert ck.rows == 15
