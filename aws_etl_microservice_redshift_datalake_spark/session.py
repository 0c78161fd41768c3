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

# Only use tmpfs scratch when it has real headroom beyond any plausible
# local-mode shuffle volume (the test corpora are ≤ tens of MB; 8 GiB free
# keeps a safety margin of ~1000× while never touching a memory-tight box).
_TMPFS_MIN_FREE_BYTES = 8 << 30


def _fast_local_dir() -> str | None:
    """Shuffle/spill scratch directory for LOCAL mode, or None for Spark's
    default.

    r15 ADJUDICATION (VERDICT r14 #1): the r14 tmpfs DEFAULT was A/B'd
    under the driver's own protocol — one fresh ``python bench.py`` per
    measurement, local[32], sf0.1, 4 alternating pairs, /proc/stat steal
    recorded (plans/r15/ab_localdir_results.jsonl). Spark-default scratch
    won ALL FOUR pairs on whole-run totals (63.2–79.5 s vs 73.2–155.3 s);
    only per-query minima showed a small tmpfs edge (geomean 0.934), i.e.
    the r14 win never reproduced where it counts. Per the verdict's
    decision rule the default is REVERTED to Spark's own scratch;
    ``SPARK_GRAFT_LOCAL_DIR=auto`` keeps the r14 behavior as an explicit
    opt-in (probe /dev/shm, require ≥8 GiB free, create 0700 and verify
    ownership), any other non-empty value is used as the directory, and
    '' / unset means Spark's default. Never applied outside local mode
    (a 100 TB shuffle exceeds RAM; executors must keep the cluster's
    disks)."""
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env != "auto":
        return env or None
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        try:
            import shutil

            if shutil.disk_usage(shm).free >= _TMPFS_MIN_FREE_BYTES:
                d = os.path.join(shm, f"spark-graft-local-{os.getuid()}")
                # /dev/shm is world-writable: create 0o700 and verify WE own
                # the directory (ADVICE r14 — another user pre-creating the
                # predictable path could read/delete our shuffle files).
                # On ownership mismatch fall back to Spark's default scratch
                # rather than silently sharing.
                os.makedirs(d, mode=0o700, exist_ok=True)
                st = os.stat(d)
                if st.st_uid != os.getuid():
                    return None
                os.chmod(d, 0o700)
                return d
        except OSError:
            return None
    return None


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
    fast_dir = _fast_local_dir()
    if fast_dir:
        # shuffle/spill scratch on the fastest local storage (see
        # _fast_local_dir) — local mode only, env-overridable
        builder = builder.config("spark.local.dir", fast_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
