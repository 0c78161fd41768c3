"""Sorts / limits / set operations / dedup — SURVEY.md §2.6 O1-O7.

Reference parity: ORDER BY / LIMIT / UNION / INTERSECT / EXCEPT / DISTINCT
(public Redshift SQL semantics; /root/reference is empty — SURVEY.md §0).

Scale notes: global ORDER BY+LIMIT plans as TakeOrderedAndProject (per
partition top-k, then k·parts merged on the driver — never a full sort);
set ops are hash-based shuffles on the full row.

Determinism: the driver's hash is order-insensitive, but LIMIT makes order
observable — every LIMIT query here carries a unique tie-breaking sort key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table


@query(
    "q_sort_nulls",
    oracle="""
    SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal
    FROM customer
    ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC
    LIMIT 50
    """,
)
def q_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: multi-key sort with explicit NULLS FIRST placement (nulls
    manufactured via NULLIF — base data is null-free), observable via LIMIT."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
            "c_acctbal",
        )
        .orderBy(F.asc_nulls_first("seg"), F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(50)
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-k → TakeOrderedAndProject (no full sort at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "q_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000.0::DOUBLE
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0::DOUBLE
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: UNION ALL — bag semantics, overlapping rows appear twice."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    a = o.filter(F.col("o_totalprice") > 250000.0).select("o_orderkey", "o_totalprice")
    b = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0)).select(
        "o_orderkey", "o_totalprice"
    )
    return a.unionAll(b)


@query(
    "q_union_distinct",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000.0::DOUBLE
    UNION
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 200000.0::DOUBLE
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: UNION (set semantics) — union + distinct."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    a = o.filter(F.col("o_totalprice") > 250000.0).select("o_orderkey", "o_totalprice")
    b = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 200000.0)).select(
        "o_orderkey", "o_totalprice"
    )
    return a.union(b).distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0::DOUBLE
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: INTERSECT (set) — nations that have both rich customers and any
    supplier."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_acctbal") > 5000.0).select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@query(
    "q_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0::DOUBLE
    EXCEPT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: EXCEPT ALL (bag difference — multiplicities subtract)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000.0).select(F.col("c_nationkey").alias("nationkey"))
    b = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.exceptAll(b)


@query(
    "q_distinct",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
    """,
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7: DISTINCT over a projection (hash-based dedup shuffle on the key).
    Keyed dedup with a keep-rule lives in text.py (L1/L2)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@query(
    "q_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0::DOUBLE
    INTERSECT ALL
    SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 (bag form): INTERSECT ALL keeps duplicate multiplicity —
    min(count_left, count_right) copies per value."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_acctbal") > 5000.0).select(F.col("c_nationkey").alias("nationkey"))
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("nationkey")
    )
    return a.intersectAll(b)


@query(
    "q_except_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 (set form): EXCEPT (distinct) — nations with customers but no
    suppliers."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
