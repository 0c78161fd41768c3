"""Degenerate-corpus robustness sweep: every registered query must EXECUTE
(not necessarily return rows) on a 1-row-per-table corpus.

Why this matters at 100 TB: size-adaptive parameters (LSH widths from
log2(n), IVF cells from isqrt(n), percentile thresholds, IDF corpus
constants) all consume corpus statistics that can be tiny on a stray
partition, a freshly-bootstrapped lake, or a heavily-filtered branch — a
log(0)/divide-by-zero/empty-seed crash here is a pipeline outage there.
Referential integrity is NOT preserved by limit(1), so joins may legally
produce zero rows; the contract under test is "no exception, schema intact",
not result values (the value gate lives in test_oracle.py).
"""

from __future__ import annotations

import os
import shutil

import pytest

import aws_etl_microservice_redshift_datalake_spark as engine
from aws_etl_microservice_redshift_datalake_spark.scratch import process_scratch

from tests.conftest import SF_SMALL, TABLES

QS = engine.all_queries()


@pytest.fixture(scope="module")
def tiny_sf(spark) -> str:
    """A 1-row copy of every table, laid out like a real sf dir."""
    d = os.path.join(process_scratch(), "sf-tiny1")
    marker = os.path.join(d, "_BUILT")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            # coalesce(1): exactly one data file so footer-stats paths see a
            # minimal-but-valid parquet layout
            (
                spark.read.parquet(f"{SF_SMALL}/{t}.parquet")
                .limit(1)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{d}/{t}.parquet")
            )
        open(marker, "w").write("ok")
    return d


@pytest.mark.parametrize("name", list(QS), ids=list(QS))
def test_query_survives_one_row_corpus(spark, tiny_sf, name):
    df = QS[name](spark, tiny_sf)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0


@pytest.fixture(scope="module")
def empty_sf(spark) -> str:
    """A 0-row copy of every table: schema-only parquet files, the
    freshly-bootstrapped-lake case."""
    d = os.path.join(process_scratch(), "sf-empty0")
    marker = os.path.join(d, "_BUILT")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
        for t in TABLES:
            (
                spark.read.parquet(f"{SF_SMALL}/{t}.parquet")
                .limit(0)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{d}/{t}.parquet")
            )
        open(marker, "w").write("ok")
    return d


@pytest.mark.parametrize("name", list(QS), ids=list(QS))
def test_query_survives_empty_corpus(spark, empty_sf, name):
    """Even 0 rows must not crash: size-adaptive parameters see n=0, k-means
    has no seeds, percentile thresholds are null — every operator must
    degrade to an empty (or all-zero-counts) result, not an exception.
    (Found and fixed: q_unload_roundtrip's re-read inferred schema from a
    data-file-less partitioned dir.)"""
    df = QS[name](spark, empty_sf)
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
