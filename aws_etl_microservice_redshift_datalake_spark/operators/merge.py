"""ETL mutation semantics: MERGE/upsert and SCD Type-2 dimension versioning.

Reference parity: Redshift MERGE (MERGE INTO target USING source ... WHEN
MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT) and the staged-upsert
idiom (COPY to staging → merge into target) are the core write path of any
ETL microservice driving Redshift; SCD2 (close the old version row, open a
new one) is the standard warehouse dimension-history pattern (public
semantics; /root/reference is empty — SURVEY.md §0).

Spark-first design: Spark's own MERGE INTO needs a transactional table
format, which is out of scope for a parquet lake engine — so the operator
expresses MERGE as what it IS relationally: a FULL OUTER equi-join between
target and change set with source-wins column coalescing. That plan is one
hash join on the merge key — shuffle-partitioned on both sides, no
driver-side state, trivially AQE-skew-splittable — i.e. exactly the shape a
1000-executor MERGE compiles to anyway. SCD2 is a join + anti-join + union:
again all hash relational algebra, no per-row logic.

The change sets are derived DETERMINISTICALLY from the fixture tables
(modular key predicates), so the DuckDB oracles replay the identical merge
in SQL and the driver hash-checks the full output state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import money_col, o_money_col, query, rnd
from ..sources.io import load_table

# Deterministic change-set predicates (see module docstring): every 10th
# order gets a price correction (UPDATE); every 97th-congruent-to-3 order is
# re-keyed far above the live keyspace as a new arrival (INSERT).
_UPD_MOD, _INS_MOD, _INS_REM, _INS_SHIFT = 10, 97, 3, 10_000_000


def merge_changes(orders: DataFrame) -> DataFrame:
    """The staging relation: updates (same key, +100.00 price, re-flagged
    priority) unioned with inserts (shifted key)."""
    upd = orders.filter(F.col("o_orderkey") % _UPD_MOD == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(100.0)
    )
    ins = (
        orders.filter(F.col("o_orderkey") % _INS_MOD == _INS_REM)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(_INS_SHIFT))
        .withColumn("o_orderstatus", F.lit("O"))
    )
    return upd.unionByName(ins)


_CHANGES_SQL = f"""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice + 100.0::DOUBLE AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % {_UPD_MOD} = 0
    UNION ALL
    SELECT o_orderkey + {_INS_SHIFT}, o_custkey, 'O',
           o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % {_INS_MOD} = {_INS_REM}
"""


@query(
    "q_merge_upsert",
    oracle=f"""
    WITH src AS ({_CHANGES_SQL}),
    merged AS (
        SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
               COALESCE(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
               COALESCE(s.o_totalprice, t.o_totalprice) AS o_totalprice
        FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
    )
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           ROUND(SUM({o_money_col("o_totalprice")}), 2) AS total_price,
           COUNT(DISTINCT o_orderkey) AS n_keys
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO orders USING changes: WHEN MATCHED UPDATE, WHEN NOT
    MATCHED INSERT — as a full-outer hash join with source-wins coalescing.
    Output is the post-merge state summarized per status (counts + exact
    price totals + key cardinality), which pins both the update application
    (+100.00 on every 10th key changes the sum) and the insert arrival
    (row/key counts grow). Prices stay on the 2-decimal grid so the rounded
    sum is deterministic (registry ``rnd`` contract); the post-merge price
    sum folds the MONEY_MAX conformance guard in both twins (r9 raw-sum
    wave — guarding AFTER the merge also covers a corrupted price arriving
    through the update channel)."""
    t = load_table(spark, sf_dir, "orders").alias("t")
    s = merge_changes(load_table(spark, sf_dir, "orders")).alias("s")
    merged = t.join(s, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full_outer").select(
        F.coalesce(F.col("s.o_orderkey"), F.col("t.o_orderkey")).alias("o_orderkey"),
        F.coalesce(F.col("s.o_orderstatus"), F.col("t.o_orderstatus")).alias("o_orderstatus"),
        F.coalesce(F.col("s.o_totalprice"), F.col("t.o_totalprice")).alias("o_totalprice"),
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(F.sum(money_col(F.col("o_totalprice")))).alias("total_price"),
        F.countDistinct("o_orderkey").alias("n_keys"),
    )


# SCD2 constants: the current dimension opened at epoch; the staging
# snapshot lands on the load date; every 7th customer changed segment.
_SCD_EPOCH = "1995-01-01 00:00:00"
_SCD_LOAD = "2000-06-01 00:00:00"
_SCD_MOD = 7
_SCD_NEWSEG = "MACHINERY"


@query(
    "q_scd2_apply",
    oracle=f"""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment,
               TIMESTAMP '{_SCD_EPOCH}' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
        FROM customer
    ),
    stage AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % {_SCD_MOD} = 0 THEN '{_SCD_NEWSEG}'
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer
    ),
    changed AS (
        SELECT d.c_custkey, d.c_mktsegment AS old_seg, s.c_mktsegment AS new_seg
        FROM dim d JOIN stage s ON d.c_custkey = s.c_custkey
        WHERE d.c_mktsegment <> s.c_mktsegment
    )
    SELECT d.c_custkey, d.c_mktsegment,
           d.valid_from,
           CASE WHEN ch.c_custkey IS NOT NULL
                THEN TIMESTAMP '{_SCD_LOAD}' ELSE d.valid_to END AS valid_to,
           ch.c_custkey IS NULL AS is_current
    FROM dim d LEFT JOIN changed ch ON d.c_custkey = ch.c_custkey
    UNION ALL
    SELECT c_custkey, new_seg, TIMESTAMP '{_SCD_LOAD}',
           CAST(NULL AS TIMESTAMP), TRUE
    FROM changed
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 apply: a staging snapshot (every 7th customer moved to
    '{seg}') lands on the current dimension — changed keys get their open
    version row CLOSED (valid_to = load date, is_current = false) and a new
    version row OPENED; unchanged keys pass through. Plan: one equi-join to
    detect changes, one left join to close, one union to open — all hash
    relational algebra, no per-row mutation. Output is the full post-apply
    dimension (|customers| + |changed| rows), hash-checked.
    """
    c = load_table(spark, sf_dir, "customer")
    dim = c.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(_SCD_EPOCH).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    stage = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % _SCD_MOD == 0, F.lit(_SCD_NEWSEG))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    changed = (
        dim.alias("d")
        .join(stage.alias("s"), "c_custkey")
        .filter(F.col("d.c_mktsegment") != F.col("s.c_mktsegment"))
        .select(
            "c_custkey", F.col("s.c_mktsegment").alias("new_seg")
        )
    )
    closed_or_kept = (
        dim.alias("d")
        .join(changed.alias("ch").select("c_custkey", F.lit(True).alias("is_changed")),
              "c_custkey", "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            "valid_from",
            F.when(F.col("is_changed"), F.lit(_SCD_LOAD).cast("timestamp"))
            .otherwise(F.col("valid_to"))
            .alias("valid_to"),
            F.coalesce(~F.col("is_changed"), F.lit(True)).alias("is_current"),
        )
    )
    opened = changed.select(
        "c_custkey",
        F.col("new_seg").alias("c_mktsegment"),
        F.lit(_SCD_LOAD).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed_or_kept.unionByName(opened)


q_scd2_apply.__doc__ = q_scd2_apply.__doc__.format(seg=_SCD_NEWSEG)
