"""Multi-level aggregation (ROLLUP / CUBE / GROUPING SETS) and the raw-SQL
entry path — SURVEY.md §2.4 A10 and §3.2 E3.

Reference parity: Redshift GROUPING SETS/ROLLUP/CUBE (public semantics;
/root/reference is empty — SURVEY.md §0).

Scale notes: Spark plans these as a single Expand (one input row → one row
per grouping set) + hash aggregate — one scan regardless of set count.

q_sql_* queries deliberately go through ``spark.sql`` over registered temp
views to exercise the parser/analyzer path (external-table analog, S8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query, rnd
from ..sources.io import load_table, register_all


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10a: ROLLUP — hierarchical subtotals (flag×status, flag, grand total)
    with grouping_id distinguishing the levels."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        rnd(F.sum("l_quantity")).alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")


@query(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
           COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10b: CUBE — all 2^k grouping combinations in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        rnd(F.sum("o_totalprice")).alias("sum_price"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_price")


@query(
    "q_sql_grouping_sets",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n,
           ROUND(SUM(c_acctbal), 2) AS sum_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def q_sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10c + E3: GROUPING SETS through the raw SQL parser path over
    registered temp views (Spectrum/external-table analog)."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS n,
               ROUND(SUM(c_acctbal), 2) AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@query(
    "q_sql_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1.0::DOUBLE - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 end-to-end (TPC-H Q3 shape, reduced to existing columns): raw-SQL
    three-way join + agg + top-k through the parser. Revenue is rounded
    before the ORDER BY so the top-10 cut is deterministic on both engines;
    l_orderkey breaks ties."""
    register_all(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1.0D - l_discount)), 2) AS revenue,
               o_orderdate
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
          AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
        """
    )
