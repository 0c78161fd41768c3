"""S2 bad-row tolerance (COPY MAXERROR analog) and declared-schema ingest
edge cases not covered by the oracle roundtrip queries."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_etl_microservice_redshift_datalake_spark.sources.io import ingest_csv

SCRATCH = "/root/repo/.tmp"


def test_csv_permissive_bad_rows(spark):
    """PERMISSIVE mode keeps good rows, routes malformed rows to the corrupt
    column — COPY's MAXERROR-style tolerance."""
    d = f"{SCRATCH}/badcsv-{uuid.uuid4().hex[:8]}"
    try:
        spark.sparkContext.parallelize(
            ["id,qty,name", "1,10,alpha", "2,not_a_number,beta", "3,30,gamma"]
        , 1).saveAsTextFile(d)
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("qty", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("_corrupt", T.StringType()),
            ]
        )
        df = ingest_csv(
            spark, d, schema, mode="PERMISSIVE", corrupt_col="_corrupt"
        ).cache()
        assert df.count() == 3
        good = df.filter(F.col("_corrupt").isNull())
        bad = df.filter(F.col("_corrupt").isNotNull())
        assert good.count() == 2
        assert bad.count() == 1
        assert bad.collect()[0]["id"] == 2  # well-formed fields survive
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_csv_failfast_raises(spark):
    d = f"{SCRATCH}/ffcsv-{uuid.uuid4().hex[:8]}"
    try:
        spark.sparkContext.parallelize(["id,qty", "1,ok_not_int"], 1).saveAsTextFile(d)
        schema = T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("qty", T.LongType())]
        )
        df = ingest_csv(spark, d, schema, mode="FAILFAST")
        try:
            df.collect()
            raised = False
        except Exception:
            raised = True
        assert raised
    finally:
        shutil.rmtree(d, ignore_errors=True)
