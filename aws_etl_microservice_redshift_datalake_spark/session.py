"""SparkSession factory tuned for this engine.

Reference parity: the reference (aws-samples/aws-etl-microservice-redshift-datalake)
is an ETL microservice that drives Amazon Redshift; its "session" is a JDBC
connection to a warehouse (SURVEY.md §0, §3.1 — reference dir is empty, so the
characterization is from public Redshift semantics). Our engine is in-process
PySpark: one SparkSession with AQE enabled plays the role of the warehouse.

Scale notes (100 TB design):
- AQE on: runtime partition coalescing + skew-join splitting replace manual
  DISTKEY tuning.
- shuffle.partitions is environment-driven: small for local test runs (where
  200 default tasks would dominate wall-clock), large on a real cluster.
- UTC session timezone: deterministic date_trunc/extract semantics that match
  the DuckDB oracle (which is timezone-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_session(
    app_name: str = "aws-etl-datalake-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    local[$SPARK_GRAFT_CPUS] by default; on a real cluster the caller passes
    its own master via spark-submit and these configs still apply.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
