"""Algorithmic-quality and invariant tests that the DuckDB oracle cannot
express: declared-vs-inferred schemas (SURVEY.md §5.2 layer 1), approximate
ANN recall vs the exact top-k, sketch sanity, and dedup idempotence."""

from __future__ import annotations

import pytest

import aws_etl_microservice_redshift_datalake_spark as engine
from aws_etl_microservice_redshift_datalake_spark.sources.io import load_table

from tests.conftest import SF_MED, SF_SMALL, TABLES

QS = engine.all_queries()


@pytest.mark.parametrize("table", TABLES)
def test_declared_schema_matches_parquet(spark, table):
    """schemas.py is the engine's DDL catalog — it must agree with what the
    self-describing parquet actually contains (events is declared post-read:
    ns → µs timestamp conversion happens in load_table)."""
    df = load_table(spark, SF_MED, table)
    declared = engine.SCHEMAS[table]
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in declared.fields]
    assert got == want


def test_lsh_ann_recall_vs_exact(spark):
    """The LSH-bucketed ANN (rows-only contract) must agree with brute force
    for most query/neighbor pairs: recall ≥ 0.5 at k=5 with 8 hyperplanes on
    this corpus (random-hyperplane LSH halves are generous at dim 64; the
    point is a regression floor, not a tight bound)."""
    exact = {
        (r["q_id"], r["t_id"])
        for r in QS["q_ann_topk"](spark, SF_MED).collect()
    }
    approx = {
        (r["q_id"], r["t_id"])
        for r in QS["q_ann_lsh_topk"](spark, SF_MED).collect()
    }
    assert exact, "exact top-k returned nothing"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH ANN recall too low: {recall:.2f}"


def test_minhash_equals_exact_neardup_pairs(spark):
    """On this corpus the LSH candidate stage loses nothing (SURVEY-documented
    bimodal Jaccard): MinHash output pairs == exact inverted-index pairs at
    the same threshold."""
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in QS["q_dedup_minhash_pairs"](spark, SF_SMALL).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QS["q_ngram_jaccard"](spark, SF_SMALL).collect()
        if r["jaccard"] >= 0.8
    }
    assert lsh == exact


def test_approx_count_distinct_close(spark):
    """HLL sketch (rows-only contract) must sit within its configured rsd of
    the exact distinct count."""
    from pyspark.sql import functions as F

    approx = {
        r["o_orderpriority"]: r["approx_n_cust"]
        for r in QS["q_agg_approx_distinct"](spark, SF_MED).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in load_table(spark, SF_MED, "orders")
        .groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(approx[k] - e) <= max(3, 0.15 * e), (k, approx[k], e)


def test_exact_dedup_idempotent(spark):
    """Dedup twice == dedup once (key-level idempotence)."""
    once = QS["q_dedup_exact"](spark, SF_MED)
    n1 = once.count()
    again = once.dropDuplicates(["keep_id"])
    assert again.count() == n1


def test_duplicate_texts_actually_detected(spark):
    """sf0.1 has duplicated texts by construction (FIXTURES.md): the hash
    dedup must find fewer groups than rows at sf0.1's documents."""
    d = load_table(spark, "/root/testdata/sf0.1", "documents")
    n_rows = d.count()
    n_groups = QS["q_dedup_hash"](spark, "/root/testdata/sf0.1").count()
    assert n_groups < n_rows
