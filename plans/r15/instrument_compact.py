#!/usr/bin/env python3
"""Phase-level timing of q_compact_roundtrip at sf0.1 (guide §1: decide where
the ~3.6 s goes before changing anything): frag write / compact / agg,
repeated N times in one session, minima reported."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import aws_etl_microservice_redshift_datalake_spark as engine
from aws_etl_microservice_redshift_datalake_spark.operators import dedup  # noqa
from aws_etl_microservice_redshift_datalake_spark.scratch import process_scratch
from aws_etl_microservice_redshift_datalake_spark.sources import maintenance as M
from aws_etl_microservice_redshift_datalake_spark.sources.io import load_table
from pyspark.sql import functions as F

sf_dir = "/root/testdata/sf0.1"
spark = engine.get_session("instrument-compact")
src = load_table(spark, sf_dir, "lineitem")
src.count()  # warm footers/JVM

mins = {}
for rep in range(3):
    tag = f"inst{rep}"
    frag = f"{process_scratch()}/frag-{tag}"
    compacted = f"{process_scratch()}/comp-{tag}"
    t0 = time.perf_counter()
    src.write.mode("overwrite").option("maxRecordsPerFile", 10_000).parquet(frag)
    t1 = time.perf_counter()
    n_before, n_target = M.plan_compaction(frag)
    t2 = time.perf_counter()
    M.compact(spark, frag, compacted)
    t3 = time.perf_counter()
    back = spark.read.parquet(compacted)
    back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    ).count()
    t4 = time.perf_counter()
    row = {"frag_write": t1 - t0, "plan": t2 - t1, "compact": t3 - t2,
           "agg": t4 - t3, "total": t4 - t0}
    print(f"rep{rep} files {n_before}->{n_target} " +
          " ".join(f"{k}={v:.3f}" for k, v in row.items()))
    for k, v in row.items():
        mins[k] = min(mins.get(k, 9e9), v)
print("MINIMA " + " ".join(f"{k}={v:.3f}" for k, v in mins.items()))
