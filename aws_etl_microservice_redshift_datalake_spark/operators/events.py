"""Event-time analytics: range join, as-of join, and the batch twins of the
streaming window operators — SURVEY.md §2.3 J8/J9, §2.9 T1-T3 (batch side).

Reference parity: time-windowed ETL over an append-only stream (public
Redshift/Kinesis-style pipeline semantics; /root/reference is empty —
SURVEY.md §0). The genuinely streaming variants live in streaming/; each of
them is verified by equivalence against the batch twins here, which in turn
carry DuckDB oracles (SURVEY.md §2.9 batch-first discipline).

Scale notes (100 TB):
- J8 avoids the O(n·m) broadcast-nested-loop trap: both sides are bucketed to
  a coarse time grid, equi-joined on the bucket, and the exact range predicate
  runs as a residual. Candidate pairs are bounded by bucket width, not n·m.
- J9 (as-of) is the union-tag + running `last(ignorenulls)` shape: one shuffle
  on the key, one sort — O(n log n), no per-row probing, no driver state.
  (SURVEY.md §7.3.)
- Sessionization is lag → flag → cumulative-sum: two window passes over the
  same (user, time) partitioning, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query, rnd
from ..sources.io import load_table

_RANGE_DAYS = 60
_BUCKET_S = _RANGE_DAYS * 86400


@query(
    "q_join_range",
    oracle=f"""
    SELECT o.o_orderkey,
           COUNT(*) AS n_shipments,
           ROUND(SUM(l.l_quantity), 2) AS qty_in_window
    FROM (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderkey % 100 = 0) o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL {_RANGE_DAYS} DAY
    GROUP BY o.o_orderkey
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: range/interval join — lineitem shipments falling inside each
    sampled order's [orderdate, orderdate+60d) window, aggregated per order.

    Implementation explodes each interval onto a 60-day bucket grid (an
    interval overlaps ≤ 2 buckets), equi-joins on the bucket, then applies
    the exact range as a residual filter — the scale-safe shape (§4.3).
    """
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.unix_timestamp("o_orderdate").alias("start_s"),
        )
        .withColumn("end_s", F.col("start_s") + F.lit(_RANGE_DAYS * 86400))
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    (F.col("start_s") / _BUCKET_S).cast("long"),
                    ((F.col("end_s") - 1) / _BUCKET_S).cast("long"),
                )
            ),
        )
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", F.unix_timestamp("l_shipdate").alias("ship_s"))
        .withColumn("bucket", (F.col("ship_s") / _BUCKET_S).cast("long"))
    )
    joined = li.join(o, "bucket").filter(
        (F.col("ship_s") >= F.col("start_s")) & (F.col("ship_s") < F.col("end_s"))
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        rnd(F.sum("l_quantity")).alias("qty_in_window"),
    )


@query(
    "q_join_asof",
    oracle="""
    WITH ob AS (
        SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS best_price
        FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           b.o_orderdate AS asof_date,
           b.best_price  AS asof_price
    FROM events e
    ASOF LEFT JOIN ob b
      ON e.user_id = b.o_custkey AND e.ts >= b.o_orderdate
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: as-of join — each event enriched with the most recent prior order
    of the same user (kdb/flink-style stream-to-dim enrichment).

    No native Spark primitive: union-tag both sides, then a running
    `last(_, ignorenulls=True)` ordered by (ts, side) per key — build rows
    sort before probe rows at equal ts, giving DuckDB ASOF's inclusive `>=`
    semantics. Build side is pre-deduped per (key, ts) so ties are
    deterministic. One shuffle + one sort; 100 TB-safe. (SURVEY.md §7.3.)
    """
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    build = (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("best_price"))
        .select(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("t"),
            F.col("o_orderdate").alias("b_date"),
            F.col("best_price").alias("b_price"),
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
        )
    )
    probe = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(None).cast("timestamp").alias("b_date"),
        F.lit(None).cast("double").alias("b_price"),
        F.lit(1).alias("side"),
        "event_id",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = build.unionByName(probe).select(
        "k",
        "side",
        "event_id",
        F.last("b_date", ignorenulls=True).over(w).alias("asof_date"),
        F.last("b_price", ignorenulls=True).over(w).alias("asof_price"),
    )
    return enriched.filter(F.col("side") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        "asof_date",
        F.col("asof_price").alias("asof_price"),
    )


@query(
    "q_tumbling_window",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (batch twin): tumbling 10-minute event-time windows per event type.
    The streaming variant (streaming/streams.py) must produce exactly this
    under trigger(availableNow); window starts are epoch-aligned on both
    engines for minute-granularity buckets."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_sliding_window",
    oracle="""
    WITH exploded AS (
        SELECT unnest([
                 CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP),
                 CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP) - INTERVAL 5 MINUTE
               ]) AS window_start,
               value
        FROM events
    )
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM exploded
    GROUP BY window_start
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 (batch twin): sliding windows — 10 minutes long, sliding every 5,
    so each event lands in exactly two windows (Spark models this as an
    internal explode, mirrored explicitly in the oracle)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "q_sessionize",
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               epoch(date_trunc('second', ts))::BIGINT AS ts_s,
               CASE WHEN epoch(date_trunc('second', ts))::BIGINT
                         - LAG(epoch(date_trunc('second', ts))::BIGINT)
                           OVER (PARTITION BY user_id ORDER BY event_id) > 1800
                         OR LAG(event_id) OVER (PARTITION BY user_id ORDER BY event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session,
               event_id
        FROM events
    ), tagged AS (
        SELECT user_id, value, ts_s,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM seq
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MAX(ts_s) - MIN(ts_s) AS duration_s,
           ROUND(SUM(value), 2) AS session_value
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (batch twin): gap-based sessionization (30-minute inactivity gap)
    via the classic lag → new-session flag → running-sum idiom. Batch twin of
    F.session_window; seconds derived from date_trunc('second') on both sides
    (ns/µs parquet split)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_s = F.unix_timestamp("ts")
    seq = e.select(
        "user_id",
        "value",
        "event_id",
        ts_s.alias("ts_s"),
        F.when(
            (ts_s - F.lag(ts_s).over(w) > 1800) | F.lag("event_id").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    tagged = seq.withColumn("session_id", F.sum("new_session").over(wrun).cast("bigint"))
    return tagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        rnd(F.sum("value")).alias("session_value"),
    )
