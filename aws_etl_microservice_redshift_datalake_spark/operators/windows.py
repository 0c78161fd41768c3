"""Window-function operators — SURVEY.md §2.5 W1-W8.

Reference parity: Redshift window-function SQL surface (public semantics;
/root/reference is empty — SURVEY.md §0).

Scale notes (100 TB): a window = one shuffle on partitionBy keys + one sort
within partitions. Partition keys here (user_id, nation, priority) have
enough cardinality to spread; a window with NO partitionBy would serialize
the world through one task and is banned in this codebase.

Determinism: every orderBy whose order is observable carries a unique
tie-breaking key (SURVEY.md §5.3); rank/dense_rank are exercised on a
deliberately tied key (year) where their semantics are still deterministic.
Windowed double sums are rounded at data granularity (DuckDB's segment-tree
accumulation order differs from Spark's running accumulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import dec, money_col, o_dec, o_money_col, query, rnd
from ..sources.io import load_table


@query(
    "q_window_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           RANK()       OVER (PARTITION BY o_orderpriority ORDER BY year(o_orderdate) NULLS FIRST) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY year(o_orderdate) NULLS FIRST) AS drnk,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY year(o_orderdate) NULLS FIRST, o_orderkey) AS rn
    FROM orders
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number / rank / dense_rank. rank and dense_rank run on a tied
    key (order year); row_number gets a unique tiebreaker. The oracle's
    explicit NULLS FIRST mirrors Spark's ASC default (DuckDB defaults to
    NULLS LAST), so NULL order dates — a PERMISSIVE-ingest reality — rank
    identically in both twins (r8 degdates mirror): they form the lowest
    tied group, the declared contract (rank the undated rows first, where
    a report reader cannot miss them)."""
    o = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    w_tied = Window.partitionBy("o_orderpriority").orderBy(yr)
    w_uniq = Window.partitionBy("o_orderpriority").orderBy(yr, "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        yr.alias("yr"),
        F.rank().over(w_tied).alias("rnk"),
        F.dense_rank().over(w_tied).alias("drnk"),
        F.row_number().over(w_uniq).alias("rn"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4)       OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS quartile,
           PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS pct_rank,
           CUME_DIST()    OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS cume
    FROM orders
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: ntile / percent_rank / cume_dist over a unique ordering.
    percent_rank/cume_dist are exact integer ratios → IEEE division is
    bit-identical on both engines, no rounding needed."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY event_id) AS next_value,
           epoch(date_trunc('second', ts))::BIGINT
             - LAG(epoch(date_trunc('second', ts))::BIGINT)
               OVER (PARTITION BY user_id ORDER BY event_id) AS gap_seconds
    FROM events
    """,
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: lag/lead — prior/next row per user, plus the inter-event gap in
    seconds (the sessionization input; epoch truncated to seconds on both
    sides because of the ns/µs parquet precision split)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    secs = F.unix_timestamp("ts")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (secs - F.lag(secs).over(w)).alias("gap_seconds"),
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id)  OVER w AS last_event,
           NTH_VALUE(event_id, 2) OVER w AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: first_value / last_value / nth_value with an explicit full frame
    (the default frame stops at CURRENT ROW, which makes last_value a
    footgun — both engines get the explicit frame)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w).alias("last_event"),
        F.nth_value("event_id", 2).over(w).alias("second_event"),
    )


@query(
    "q_window_running",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(SUM({o_money_col("value")}) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: running total (cumulative frame). The double sum is rounded at the
    data's 2-decimal grid: engines accumulate in different orders internally.
    The summed value carries the MONEY_MAX conformance guard in both twins
    (r8 degmoney wave): one NaN/±Inf/±1e308 measurement otherwise poisons
    every subsequent running value in the partition — and does so
    DIFFERENTLY per engine once the fold order differs. Non-conforming
    rows null out and SUM skips them identically; running_n still counts
    every row, so the report shows where values were excluded."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        rnd(F.sum(money_col(F.col("value"))).over(w)).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "q_window_moving",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(SUM({o_money_col("value")}) OVER w3, 2) AS moving_sum,
           ROUND(SUM({o_money_col("value")}) OVER w3, 2) / (COUNT(*) OVER w3) AS moving_avg
    FROM events
    WINDOW w3 AS (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: sliding k-row aggregate (3-row moving sum/average). The average is
    rounded-sum / frame-count — an exact IEEE division, per the registry
    float discipline."""
    e = load_table(spark, sf_dir, "events")
    w3 = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, Window.currentRow)
    msum = rnd(F.sum(money_col(F.col("value"))).over(w3))
    return e.select(
        "event_id",
        "user_id",
        msum.alias("moving_sum"),
        (msum / F.count(F.lit(1)).over(w3)).alias("moving_avg"),
    )


@query(
    "q_window_range",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(SUM({o_money_col("value")}) OVER (PARTITION BY user_id ORDER BY epoch(date_trunc('second', ts))::BIGINT
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS hour_value
    FROM events
    WHERE ts IS NOT NULL
    """,
)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: RANGE frame over event-time — per-user trailing-1-hour value sum
    (time-windowed running aggregate on the epoch-seconds axis). NULL-ts
    rows are excluded in both twins (the q_tumbling_window NULL event-time
    contract, r8): a RANGE frame anchored at a NULL instant is undefined,
    and the engines otherwise disagree on where NULL sorts (Spark NULLS
    FIRST vs DuckDB LAST on ASC)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        rnd(F.sum(money_col(F.col("value"))).over(w)).alias("hour_value"),
    )


@query(
    "q_window_topk",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer
    ) t WHERE rn <= 3
    """,
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: top-k per group (rank-then-filter) — the distributed top-k idiom:
    no global sort, one shuffle on the group key."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


@query(
    "q_window_ratio_to_report",
    oracle=f"""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN den <> 0 THEN price / den END AS price_share
    FROM (
        SELECT o_orderkey, o_orderstatus,
               {o_money_col("o_totalprice")} AS price,
               ROUND(SUM({o_money_col("o_totalprice")})
                     OVER (PARTITION BY o_orderstatus), 2) AS den
        FROM orders
    )
    """,
)
def q_window_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT (Redshift's named share-of-total window function):
    each order's share of its status group's total price — expressed as
    x / sum(x) OVER (PARTITION BY ...). The group sum is stabilized with
    the registry ``rnd`` contract (2-dec-grid money, order-insensitive
    after rounding), so the division is the same IEEE op on both engines.
    One shuffle on the partition key; no ordering needed (unordered frame).
    A zero group total yields NULL shares, not a crash: under ANSI (the
    Spark 4 default) x/0 throws DIVIDE_BY_ZERO for every numeric type, and
    an all-zero-priced partition is a legal slice of a real lake (r6
    zero-money degenerate sweep); the guard is spelled identically in the
    oracle twin. Both the window-sum input AND the numerator fold the
    MONEY_MAX conformance guard (r9 raw-sum wave): a ±1e308 sentinel must
    neither poison the group denominator nor report its own absurd share —
    a non-conforming row's share is NULL, identically in both twins."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus")
    price = money_col(F.col("o_totalprice"))
    den = rnd(F.sum(price).over(w))
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(den != 0, price / den).alias("price_share"),
    )


@query(
    "q_supplier_pareto",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               SUM({o_dec("l_extendedprice * (1.0::DOUBLE - l_discount)", 4, 27)}) AS r
        FROM lineitem GROUP BY l_suppkey
    ), c AS (
        SELECT suppkey, r,
               SUM(r) OVER (ORDER BY r DESC, suppkey ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               SUM(r) OVER () AS tot
        FROM rev
    )
    SELECT suppkey,
           CAST(ROUND(r, 2) AS DOUBLE) AS revenue,
           CASE WHEN tot <> 0
                THEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
           END AS cum_share,
           (cum * 10) <= (tot * 8) AS is_top80
    FROM c
    """,
)
def q_supplier_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / 80-20 concentration analysis — the classic warehouse report
    (which suppliers carry 80% of revenue): revenue ranked descending with
    a running cumulative share and an in-top-80% flag.

    Float discipline: per-supplier revenue is the MONEY_MAX-guarded
    registry.dec DECIMAL (grid 4 — r8 degmoney wave: one ±1e308 price
    otherwise throws the decimal hop corpus-wide under ANSI; a no-op on
    clean 2-grid money) and stays DECIMAL through the ordering, the
    running window SUM, and
    the 80% test — which is the INTEGER-decimal comparison cum·10 ≤ tot·8,
    exact on both engines even when a supplier lands precisely on the
    boundary. Doubles appear only in display columns (exact decimal→double
    conversion + one correctly-rounded division). Scale shape: one
    map-combinable per-supplier aggregate, then windows over |suppliers|
    rows (dim-sized, not fact-sized); the at-scale form for a fact-sized
    key is the histogram-threshold pick (q_token_budget_prune's pattern).
    Zero total revenue (an all-zero-priced slice — r6 zero-money sweep)
    yields NULL cum_share instead of an ANSI DIVIDE_BY_ZERO crash; the
    is_top80 integer-decimal test needs no guard (0 <= 0 is just true)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = F.sum(
        dec(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")), 4, 27)
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(r.alias("r"))
    w = (
        Window.orderBy(F.desc("r"), F.asc("suppkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy()
    c = rev.select(
        "suppkey",
        "r",
        F.sum("r").over(w).alias("cum"),
        F.sum("r").over(wall).alias("tot"),
    )
    return c.select(
        "suppkey",
        F.round("r", 2).cast("double").alias("revenue"),
        F.when(
            F.col("tot") != 0,
            F.round(F.col("cum").cast("double") / F.col("tot").cast("double"), 6),
        ).alias("cum_share"),
        ((F.col("cum") * 10) <= (F.col("tot") * 8)).alias("is_top80"),
    )


EWMA_LAGS = 16  # truncation depth: the dropped tail carries weight 2^-16
# (~1.5e-5 of the signal) — and makes the recurrence a FIXED-length chain
# of exact ops instead of an engine-specific running accumulation


def ewma_chain(
    df: DataFrame, alpha: float = 0.5, lags: int = EWMA_LAGS
) -> DataFrame:
    """Truncated EWMA over event time as a FIXED-ORDER lag chain — the
    q_window_ewma recurrence, parameterized for property twins (the
    bm25_rank split precedent): y_i = Σ_{j<lags} coalesce(guard(x_{i-j}),
    0) · α(1−α)^j, the j-ascending LEFT-ASSOCIATED IEEE sum over one
    (user_id, ts, event_id) window. Each weight is computed ONCE in
    Python (an IEEE double) and shipped as a literal, so a Python
    reference folding the SAME doubles in the SAME order is bit-identical
    for ANY alpha — the fixed order, not the weight values, carries the
    cross-engine exactness. At the registered α = 1/2 the weights are
    additionally EXACT powers of two (0.5·0.5^j == 2^-(j+1), every factor
    a power of two, asserted below), so each term is one correctly-
    rounded multiply of an exactly-representable weight — the property
    the registered oracle's unrounded output relies on. Expects
    (event_id, user_id, ts, value); NULL-ts rows are excluded (W7
    contract), non-conforming values (MONEY_MAX guard) and missing lags
    contribute exactly 0.0."""
    e = df.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    acc = None
    for j in range(lags):
        x = money_col(F.col("value"))
        src = x if j == 0 else F.lag(x, j).over(w)
        t = F.coalesce(src, F.lit(0.0)) * F.lit(alpha * (1.0 - alpha) ** j)
        acc = t if acc is None else acc + t
    return e.select("event_id", "user_id", acc.alias("ewma"))


# The parameterized weights must BE the registered query's power-of-two
# literals at the default alpha (the _BM25_* round-trip discipline).
assert all(0.5 * 0.5**j == 2.0 ** -(j + 1) for j in range(EWMA_LAGS))


@query(
    "q_window_ewma",
    oracle=f"""
    SELECT event_id, user_id,
           (COALESCE({o_money_col("value")}, 0.0) * 0.5
           + COALESCE(lag({o_money_col("value")}, 1) OVER w, 0.0) * 0.25
           + COALESCE(lag({o_money_col("value")}, 2) OVER w, 0.0) * 0.125
           + COALESCE(lag({o_money_col("value")}, 3) OVER w, 0.0) * 0.0625
           + COALESCE(lag({o_money_col("value")}, 4) OVER w, 0.0) * 0.03125
           + COALESCE(lag({o_money_col("value")}, 5) OVER w, 0.0) * 0.015625
           + COALESCE(lag({o_money_col("value")}, 6) OVER w, 0.0) * 0.0078125
           + COALESCE(lag({o_money_col("value")}, 7) OVER w, 0.0) * 0.00390625
           + COALESCE(lag({o_money_col("value")}, 8) OVER w, 0.0) * 0.001953125
           + COALESCE(lag({o_money_col("value")}, 9) OVER w, 0.0) * 0.0009765625
           + COALESCE(lag({o_money_col("value")}, 10) OVER w, 0.0) * 0.00048828125
           + COALESCE(lag({o_money_col("value")}, 11) OVER w, 0.0) * 0.000244140625
           + COALESCE(lag({o_money_col("value")}, 12) OVER w, 0.0) * 0.0001220703125
           + COALESCE(lag({o_money_col("value")}, 13) OVER w, 0.0) * 6.103515625e-05
           + COALESCE(lag({o_money_col("value")}, 14) OVER w, 0.0) * 3.0517578125e-05
           + COALESCE(lag({o_money_col("value")}, 15) OVER w, 0.0) * 1.52587890625e-05) AS ewma
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user over event time —
    the smoothing every metrics/anomaly stack runs, as a window operator
    the plain moving-average family (W6) cannot express: the weight
    DECAYS with distance from the current row.

    Exactness by construction: alpha = 1/2, so the truncated recurrence
    y_i = sum_j x_(i-j) * 2^-(j+1) uses weights that are EXACT powers of
    two — each product is one correctly-rounded IEEE multiply and the
    16-term sum is spelled as an explicit FIXED-ORDER lag chain in both
    engines (never a window SUM, whose accumulation order is
    engine-specific: Spark running vs DuckDB segment tree). Both twins
    therefore compute bit-identical doubles, and the output is emitted
    UNROUNDED — a grid round here would be WRONG, not just unnecessary:
    the true values are rationals p/(100*2^16) that sit exactly on 4dp
    half-way points, where the engines' round implementations disagree
    (15 of 10,000 rows flipped by one grid step when a ROUND(...,4) was
    tried; the registry rnd docstring documents this exact class).
    Missing lags (partition start) and non-conforming values (the
    MONEY_MAX guard) contribute exactly 0.0 in both. NULL-ts rows are
    excluded (the W7/tumbling NULL event-time contract).

    Scale shape: ONE window = one user_id shuffle + one in-partition
    sort; all 16 lags share it (Spark plans a single Window node); the
    arithmetic is row-local codegen. Body is :func:`ewma_chain` at its
    defaults (α = 1/2, 16 lags) — the r12 library split for the
    randomized-parameter property twin; the default weights are the same
    doubles as the former inline 2^-(j+1) literals (asserted above)."""
    return ewma_chain(load_table(spark, sf_dir, "events"))
