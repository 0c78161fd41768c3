"""Projection / filter / predicate operators — SURVEY.md §2.2 P1-P6.

Reference parity: the SELECT-list / WHERE surface of Redshift SQL (public
semantics; /root/reference is empty — SURVEY.md §0). Everything here is pure
narrow transformation: no shuffle at any scale, filters and column pruning
reach the Parquet scan via Catalyst pushdown (verify with
``df.explain`` → PushedFilters / ReadSchema).

Float discipline: per-row IEEE arithmetic on doubles is bit-identical between
Spark and DuckDB, so computed row-level doubles pass through unrounded; DuckDB
literals are forced to ``::DOUBLE`` so DuckDB doesn't switch to DECIMAL math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import MONEY_MAX, QTY_MAX, guarded_bigint, o_guarded_bigint, query
from ..sources.io import load_table


@query(
    "q_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice AS price,
           l_extendedprice * (1.0::DOUBLE - l_discount) AS disc_price,
           concat_ws('-', l_returnflag, l_linestatus) AS flag_status
    FROM lineitem
    """,
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: SELECT list with expressions, aliases, computed columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("disc_price"),
        F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag_status"),
    )


@query(
    "q_filter",
    oracle="""
    SELECT * FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 150000.0::DOUBLE)
       OR (NOT o_orderstatus = 'O' AND o_totalprice < 10000.0::DOUBLE)
    """,
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: conjunctive/disjunctive WHERE with AND / OR / NOT."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
        | (~(F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 10000.0))
    )


@query(
    "q_filter_in_between",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
      AND c_acctbal BETWEEN 0.0::DOUBLE AND 5000.0::DOUBLE
      AND c_name IS NOT NULL
    """,
)
def q_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: IN-list, BETWEEN range, IS NULL predicates."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")
        & F.col("c_acctbal").between(0.0, 5000.0)
        & F.col("c_name").isNotNull()
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_name LIKE '%red%'
       OR regexp_matches(p_name, '^sm')
       OR p_brand LIKE 'Brand#1_'
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: LIKE wildcard and regex predicates."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%red%")
        | F.col("p_name").rlike("^sm")
        | F.col("p_brand").like("Brand#1_")
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CASE WHEN o_totalprice > 250000.0::DOUBLE THEN 'big'
                WHEN o_totalprice > 100000.0::DOUBLE THEN 'mid'
                ELSE 'small' END AS size_band,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_word
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: searched CASE and simple CASE projection."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") > 250000.0, "big")
        .when(F.col("o_totalprice") > 100000.0, "mid")
        .otherwise("small")
        .alias("size_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("pending")
        .alias("status_word"),
    )


@query(
    "q_cast",
    oracle=f"""
    SELECT l_orderkey,
           {o_guarded_bigint("l_quantity")} AS qty_int,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           CAST(CASE WHEN l_extendedprice BETWEEN -{MONEY_MAX:.0f} AND {MONEY_MAX:.0f}
                     THEN CAST(l_extendedprice AS DECIMAL(18,2)) END
                AS DOUBLE) AS price_dec,
           CAST(CAST(l_linenumber AS VARCHAR) AS BIGINT) AS line_roundtrip
    FROM lineitem
    """,
)
def q_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: explicit casts — double→int, timestamp→date, int→string→int, and a
    double→DECIMAL(18,2)→double round-trip (Redshift money semantics; data is
    exact 2-decimal so the decimal hop is lossless on both engines). The
    decimal lands back in DOUBLE because oracle-checked outputs stay scalar
    primitives — Decimal objects hash differently across pandas bridges.
    The double-narrowing casts carry the conformance guards (r7
    extreme-money sweep; QTY_MAX for the quantity, MONEY_MAX for the
    price — ONE contract per column suite-wide): one 1e308/NaN price
    throws ANSI CAST_OVERFLOW / decimal out-of-range — non-conforming doubles cast to NULL by the contract
    spelled identically in both twins (a BETWEEN guard, which NaN and ±Inf
    fail in both engines; DuckDB's TRY_CAST still throws on NaN→DECIMAL,
    so TRY_CAST is not a safe mirror)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        guarded_bigint(qty).alias("qty_int"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.when(price.between(-MONEY_MAX, MONEY_MAX), price)
        .cast("decimal(18,2)")
        .cast("double")
        .alias("price_dec"),
        F.col("l_linenumber").cast("string").cast("bigint").alias("line_roundtrip"),
    )
