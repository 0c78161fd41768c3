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


def test_materialized_view_caches_and_refreshes(spark, tmp_path):
    """MV contract: queries against the view hit the columnar cache
    (InMemoryTableScan in the plan); REFRESH rebuilds from changed base
    data."""
    from pyspark.sql import functions as F

    from aws_etl_microservice_redshift_datalake_spark.operators.matview import (
        create_materialized_view,
        refresh_materialized_view,
    )

    base = str(tmp_path / "mv-base")
    spark.range(0, 100).select(F.col("id"), (F.col("id") % 5).alias("g")).write.parquet(base)
    spark.read.parquet(base).createOrReplaceTempView("mv_base")

    mv = create_materialized_view(
        spark, "mv_sums", "SELECT g, COUNT(*) AS n FROM mv_base GROUP BY g"
    )
    assert mv.count() == 5  # materializes the cache
    p = spark.sql("SELECT SUM(n) FROM mv_sums")._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in p, "MV queries must hit the cache"
    assert spark.sql("SELECT SUM(n) AS s FROM mv_sums").collect()[0].s == 100

    # base data grows; REFRESH rebuilds the cache over the new file set
    # (a new file listing changes the canonical plan, so the old cache
    # entry no longer matches — Spark gives freshness, not staleness)
    spark.range(100, 150).select(F.col("id"), (F.col("id") % 5).alias("g")).write.mode(
        "append"
    ).parquet(base)
    spark.read.parquet(base).createOrReplaceTempView("mv_base")
    mv2 = refresh_materialized_view(spark, "mv_sums")
    assert mv2.count() == 5
    assert spark.sql("SELECT SUM(n) AS s FROM mv_sums").collect()[0].s == 150
    p2 = spark.sql("SELECT SUM(n) FROM mv_sums")._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in p2, "refreshed MV queries must hit the cache again"


def test_etl_job_compact_and_cluster_stages(spark):
    """The maintenance verbs as job stages: a fragmented unload compacts in
    place (idempotent — a second compact stage is a no-op), and a clustered
    sink writes range-disjoint files."""
    from aws_etl_microservice_redshift_datalake_spark.pipeline import EtlJob
    from aws_etl_microservice_redshift_datalake_spark.sources.io import _parquet_files, load_table
    from aws_etl_microservice_redshift_datalake_spark.sources.maintenance import file_ranges

    base = "/root/repo/.tmp/job-maint"
    frag = f"{base}/orders"
    clus = f"{base}/orders-clustered"

    job = (
        EtlJob("maintenance")
        .ingest("orders", lambda s: load_table(s, SF_MED, "orders"))
        .transform("big", "SELECT * FROM orders")
        .sink(
            "fragment",
            lambda s: s.table("big")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", 500)
            .parquet(frag),
        )
        .compact(frag)
        .compact(frag)  # second pass must be a no-op
        .cluster("big", clus, ["o_orderkey"], n_files=4)
    )
    report = job.run(spark)
    by_name = {s.name: s for s in report.stages}
    assert len(_parquet_files(frag)) == 1
    # idempotence: the second compact stage reported the already-compact count
    compact_stages = [s for s in report.stages if s.name.startswith("compact:")]
    assert compact_stages[1].rows == 1

    # multi-file idempotence (regression: floor-divided records-per-file
    # overshot the planned file count, so every later compact re-rewrote
    # the table): with a target that plans n_target > 1, the rewrite must
    # land AT or UNDER the plan and the next compact must be a no-op
    from aws_etl_microservice_redshift_datalake_spark.sources.maintenance import (
        plan_compaction,
        table_bytes,
    )

    frag2 = f"{base}/orders-multi"
    spark.table("big").write.mode("overwrite").option(
        "maxRecordsPerFile", 500
    ).parquet(frag2)
    tgt = max(1, table_bytes(frag2) // 3)  # plans ~3-4 files
    n_before, n_target = plan_compaction(frag2, tgt)
    assert n_target > 1
    job2 = EtlJob("maint2").compact(frag2, tgt).compact(frag2, tgt)
    rep2 = job2.run(spark)
    stages2 = [s for s in rep2.stages if s.name.startswith("compact:")]
    n_after = len(_parquet_files(frag2))
    assert n_after <= n_target, (n_after, n_target)
    # second stage saw an already-compact layout and skipped the rewrite
    assert stages2[1].rows == n_after
    ranges = sorted(file_ranges(clus, "o_orderkey"))
    assert len(ranges) == 4
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
