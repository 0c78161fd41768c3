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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import QTY_MAX, money_col, o_money_col, query, rnd
from ..sources.io import load_table

_RANGE_DAYS = 60
_BUCKET_S = _RANGE_DAYS * 86400


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    probe_ts: str,
    build_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """J9 as a reusable operator: enrich each probe row with the latest build
    row whose ``build_ts`` <= its ``probe_ts`` (per key) — DuckDB/kdb ASOF
    semantics, inclusive.

    Shape: union-tag both sides, one window ``last(_, ignorenulls=True)``
    ordered by (ts, side) per key — build rows sort before probe rows at
    equal ts, so an exact-tie build row IS visible to the probe row. The
    caller must pre-dedupe build to one row per (key, ts) if ties need to be
    deterministic. One shuffle + one sort, O(n log n), no per-row probing —
    100 TB-safe (SURVEY.md §7.3).

    Returns the probe rows with ``value_cols`` appended (null where no build
    row precedes).
    """
    clash = set(value_cols) & set(probe.columns)
    if clash:
        # the union-tag shape nulls probe columns that share a value_col name —
        # refuse loudly instead of silently corrupting the probe output
        raise ValueError(
            f"asof_join: value_cols {sorted(clash)} collide with probe columns; "
            "rename the build value columns before joining"
        )
    b = build.select(
        F.col(key).alias("__k"),
        F.col(build_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
    )
    probe_cols = probe.columns
    p = probe.select(
        F.col(key).alias("__k"),
        F.col(probe_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in probe_cols],
    )
    for c in value_cols:
        p = p.withColumn(c, F.lit(None).cast(b.schema[c].dataType))
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = b.unionByName(p, allowMissingColumns=True)
    enriched = unioned.select(
        "__side",
        *probe_cols,
        *[F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}") for c in value_cols],
    )
    return enriched.filter(F.col("__side") == 1).drop("__side")


def sessionize(
    df: DataFrame, key: str, ts_seconds: Column, gap_s: int, order_col: str | None = None
) -> DataFrame:
    """T3's batch sessionizer as a reusable operator: assigns a per-key
    ``session_id`` (1-based, in ``order_col`` order — defaults to time order)
    where a gap > ``gap_s`` seconds starts a new session. Classic lag →
    new-session flag → running sum: two window passes over ONE partitioning,
    no self-join, state bounded by the partition sort."""
    order = order_col or "__ts_s"
    w = Window.partitionBy(key).orderBy(order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df.withColumn("__ts_s", ts_seconds)
    out = out.withColumn(
        "__new",
        F.when(
            (F.col("__ts_s") - F.lag("__ts_s").over(w) > gap_s)
            | F.lag("__ts_s").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    return out.withColumn(
        "session_id", F.sum("__new").over(wrun).cast("bigint")
    ).drop("__new")


@query(
    "q_join_range",
    oracle=f"""
    SELECT o.o_orderkey,
           COUNT(*) AS n_shipments,
           ROUND(SUM({o_money_col("l.l_quantity", QTY_MAX)}), 2) AS qty_in_window
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
        rnd(F.sum(money_col(F.col("l_quantity"), QTY_MAX))).alias("qty_in_window"),
    )


@query(
    "q_join_asof",
    oracle="""
    WITH ob AS (
        SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS best_price
        FROM orders WHERE o_orderdate IS NOT NULL
        GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           b.o_orderdate AS asof_date,
           b.best_price  AS asof_price
    FROM events e
    ASOF LEFT JOIN ob b
      ON e.user_id = b.o_custkey AND e.ts >= b.o_orderdate
    WHERE e.ts IS NOT NULL
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

    NULL event-time contract (r8, VERDICT r7 #3): rows with a NULL ts on
    EITHER side are excluded in both twins — "most recent prior" is
    undefined at a NULL instant, and the engines otherwise disagree on
    where NULL sorts in the union-tag order (Spark NULLS FIRST vs DuckDB
    LAST). Matches watermark semantics: a streaming as-of would drop
    NULL-ts rows at the watermark operator anyway."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull()
    )
    build = (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_totalprice").alias("best_price"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("o_ts"),
            F.col("o_orderdate").alias("date"),
            F.col("best_price").alias("price"),
        )
    )
    probe = e.select("event_id", "user_id", "ts")
    return asof_join(
        probe, build, key="user_id", probe_ts="ts", build_ts="o_ts",
        value_cols=["date", "price"],
    ).select("event_id", "user_id", "asof_date", "asof_price")


@query(
    "q_tumbling_window",
    oracle=f"""
    SELECT CAST(time_bucket(INTERVAL '10 minutes', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM({o_money_col("value")}), 2) AS sum_value
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 (batch twin): tumbling 10-minute event-time windows per event type.
    The streaming variant (streaming/streams.py) must produce exactly this
    under trigger(availableNow); window starts are epoch-aligned on both
    engines for minute-granularity buckets.

    NULL event-time contract (r8, VERDICT r7 #3): NULL-ts rows are excluded
    in both twins — Spark's window() emits no group for them anyway (an
    accident of engine semantics now declared), DuckDB's time_bucket(NULL)
    would form a NULL group, and a streaming watermark drops them. Spelled
    as an explicit pre-filter so the batch twin, the stream, and the
    oracle state the same population."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum(money_col(F.col("value")))).alias("sum_value"),
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
    oracle=f"""
    WITH exploded AS (
        SELECT unnest([
                 CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP),
                 CAST(time_bucket(INTERVAL '5 minutes', ts) AS TIMESTAMP) - INTERVAL 5 MINUTE
               ]) AS window_start,
               value
        FROM events
        WHERE ts IS NOT NULL
    )
    SELECT window_start, COUNT(*) AS n_events, ROUND(SUM({o_money_col("value")}), 2) AS sum_value
    FROM exploded
    GROUP BY window_start
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 (batch twin): sliding windows — 10 minutes long, sliding every 5,
    so each event lands in exactly two windows (Spark models this as an
    internal explode, mirrored explicitly in the oracle). NULL-ts rows are
    excluded in both twins (the q_tumbling_window NULL event-time
    contract, r8)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum(money_col(F.col("value")))).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "q_sessionize",
    oracle=f"""
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
        WHERE ts IS NOT NULL
    ), tagged AS (
        SELECT user_id, value, ts_s,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM seq
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MAX(ts_s) - MIN(ts_s) AS duration_s,
           ROUND(SUM({o_money_col("value")}), 2) AS session_value
    FROM tagged
    GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (batch twin): gap-based sessionization (30-minute inactivity gap)
    via the classic lag → new-session flag → running-sum idiom. Batch twin of
    F.session_window; seconds derived from date_trunc('second') on both sides
    (ns/µs parquet split). NULL-ts rows are excluded in both twins (the
    q_tumbling_window NULL event-time contract, r8): a NULL instant can
    neither extend nor break a session, and session_window drops it
    anyway."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "value", "event_id", "ts")
    )
    tagged = sessionize(
        e, key="user_id", ts_seconds=F.unix_timestamp("ts"), gap_s=1800,
        order_col="event_id",
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("__ts_s") - F.min("__ts_s")).alias("duration_s"),
        rnd(F.sum(money_col(F.col("value")))).alias("session_value"),
    )


@query(
    "q_time_gapfill",
    oracle="""
    WITH users AS (
        SELECT DISTINCT user_id FROM events WHERE user_id < 10
    ),
    spine AS (
        SELECT user_id,
               unnest(generate_series(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-01-30',
                                      INTERVAL 1 DAY)) AS day
        FROM users
    ),
    obs AS (
        SELECT user_id, date_trunc('day', ts) AS day,
               max_by(value, event_id) AS day_value
        FROM events
        WHERE user_id < 10 AND event_type = 'purchase'
          AND value IS NOT NULL AND NOT isnan(value) AND NOT isinf(value)
        GROUP BY 1, 2
    )
    SELECT s.user_id, s.day,
           last_value(o.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
           o.day_value IS NOT NULL AS observed
    FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.day = o.day
    """,
)
def q_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill with LOCF (the hypertable `time_bucket_gapfill`
    + `locf` idiom): a dense per-user daily spine (generated, not scanned)
    left-joined with observed daily values (latest purchase per day via
    max_by on the monotone event_id — deterministic), then
    last-observation-carried-forward via `last(ignorenulls)` over the spine
    ordering. Days before a user's first observation stay NULL by contract.
    A NULL or NaN measurement is NO observation, spelled identically in
    both twins (r7 degraded-twin gate: DuckDB's arg_max IGNORES NULL
    values while Spark's max_by returns them, so a day whose latest
    purchase carries a NULL value silently diverged the LOCF chain on
    degraded corpora; r7 review: non-finite is excluded too — one NaN'd
    or ±Inf'd sensor reading must not poison the carried-forward chain
    for every subsequent gap day, matching q_stream_stateful's
    missing-by-contract treatment of the same column — which r8 tightened
    to the MONEY_MAX conformance bound for SUM consumers; LOCF carries a
    single value, so the non-finite exclusion suffices here).

    Scale notes: the spine is |users|×|days| rows generated row-locally from
    a sequence (no scan); the fill is ONE window pass over the spine
    partitioning — at 100 TB this shuffles the (small) spine+obs relation
    once on user_id, never the raw events beyond the daily pre-aggregation.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    users = ev.select("user_id").distinct()
    spine = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    obs = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & F.col("value").isNotNull()
            & ~F.isnan("value")
            & (F.abs(F.col("value")) != float("inf"))
        )
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.max_by("value", "event_id").alias("day_value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(obs, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
        F.col("day_value").isNotNull().alias("observed"),
    )


@query(
    "q_event_cohorts",
    oracle="""
    WITH firsts AS (
        -- DuckDB date_trunc('week') yields DATE; cast back to TIMESTAMP to
        -- match Spark's timestamp-typed date_trunc
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
        FROM events
    )
    SELECT f.cohort_week, a.active_week,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_event_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted in
    every week they were active — the warehouse retention report. Two
    aggregations over one events scan plus an equi-join on user_id; the
    cohort dimension is derived, never stored. Week truncation is coarser
    than the §5.3 second-discipline floor, so the ns→µs parquet gap cannot
    surface."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q_event_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type, date_trunc('second', ts) AS ts_s
        FROM events
    ),
    v AS (SELECT user_id, MIN(ts_s) AS t1 FROM s
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT s.user_id, MIN(s.ts_s) AS t2 FROM s JOIN v USING (user_id)
          WHERE s.event_type = 'click' AND s.ts_s > v.t1 GROUP BY s.user_id),
    p AS (SELECT s.user_id, MIN(s.ts_s) AS t3 FROM s JOIN c USING (user_id)
          WHERE s.event_type = 'purchase' AND s.ts_s > c.t2 GROUP BY s.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): users whose first
    click follows their first view, and whose first purchase follows that
    click. Each stage is ONE aggregate on the events scan equi-joined to
    the previous stage's (user, ts) frontier with the ordering as a
    residual — hash joins only, no window over the full event stream, no
    per-user Python. Timestamps are truncated to seconds on both engines
    before any comparison (§5.3 ns-discipline)."""
    s = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.date_trunc("second", "ts").alias("ts_s")
    )
    v = (
        s.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t1"))
    )
    c = (
        s.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts_s") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t2"))
    )
    p = (
        s.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_s") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


@query(
    "q_event_wau",
    oracle="""
    WITH days AS (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-07',
                                      TIMESTAMP '2024-01-30',
                                      INTERVAL 1 DAY)) AS day
    ),
    du AS (
        SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
    )
    SELECT day, COUNT(DISTINCT user_id) AS wau
    FROM days JOIN du ON du.d > day - INTERVAL 7 DAY AND du.d <= day
    GROUP BY day
    """,
)
def q_event_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (the WAU/DAU report): sliding
    DISTINCT counts cannot use an ordinary window frame (distinct does not
    decompose), so the engine idiom is a generated day spine range-joined
    to the per-day distinct-user relation and re-aggregated. The spine is
    ~30 rows → it broadcasts and the 'nested loop' is 30 comparisons per
    pre-deduped (day, user) row — linear in distinct activity, never in raw
    events. Day truncation is coarser than the §5.3 second floor."""
    e = load_table(spark, sf_dir, "events")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-07").cast("timestamp"),
                F.lit("2024-01-30").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    du = e.select(F.date_trunc("day", "ts").alias("d"), "user_id").distinct()
    return (
        F.broadcast(days)
        .join(
            du,
            (F.col("d") > F.col("day") - F.expr("INTERVAL 7 DAY"))
            & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


Z_THRESHOLD = 1.5  # |z| flagging threshold for daily-volume anomalies


@query(
    "q_anomaly_zscore",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ), st AS (
        SELECT event_type, ROUND(AVG(n_events), 4) AS mu,
               ROUND(stddev_samp(n_events), 4) AS sd
        FROM daily GROUP BY 1
    )
    SELECT event_type, day, n_events,
           ROUND((n_events - mu) / sd, 4) AS z
    FROM daily JOIN st USING (event_type)
    WHERE abs(ROUND((n_events - mu) / sd, 4)) >= {Z_THRESHOLD}
    """,
)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection: flag (event_type, day) cells whose
    event count deviates ≥ Z_THRESHOLD sample standard deviations from
    that type's daily mean — the ops-dashboard spike/drop detector.

    Float discipline: mean and stddev are rounded to the 1e-4 grid per
    type BEFORE the z computation (the A5-proven stddev rule; AVG of
    ints over 30 days cannot land on a rounding boundary), so z is an
    IEEE-identical division of identical doubles on both engines and the
    threshold cut is deterministic. Scale shape: one map-combinable
    daily aggregate (cells ≤ types × days), a tiny per-type stats
    aggregate broadcast back, map-side filter."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    st = daily.groupBy("event_type").agg(
        F.round(F.avg("n_events"), 4).alias("mu"),
        F.round(F.stddev_samp("n_events"), 4).alias("sd"),
    )
    z = F.round((F.col("n_events") - F.col("mu")) / F.col("sd"), 4)
    return (
        daily.join(F.broadcast(st), "event_type")
        .select("event_type", "day", "n_events", z.alias("z"))
        .filter(F.abs(F.col("z")) >= Z_THRESHOLD)
    )


@query(
    "q_event_markov",
    oracle="""
    WITH seq AS (
        SELECT event_type AS next,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
                   AS prev
        FROM events
    ),
    trans AS (
        SELECT prev, next, COUNT(*) AS n_transitions
        FROM seq WHERE prev IS NOT NULL
        GROUP BY prev, next
    )
    SELECT prev, next, n_transitions,
           CAST(n_transitions AS DOUBLE)
               / SUM(n_transitions) OVER (PARTITION BY prev) AS prob
    FROM trans
    """,
)
def q_event_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences —
    the behavioral-model prep (and sequence-corpus sanity check) run before
    training on event streams: P(next event type | previous), estimated per
    user-ordered history.

    Determinism: sequences order by event_id alone (ts is ns-truncated on
    the Spark side — FIXTURES.md — and monotone with event_id anyway, so
    the id IS the event-time order without touching the ns/µs trap). The
    probability is one integer÷integer division of bit-identical operands
    (correctly rounded IEEE divide on both engines) — no rounding
    discipline needed. Scale shape: one shuffle partitions users, the lag
    window sorts per user; transitions collapse to |types|² rows, so the
    normalizing window runs on a 25-row relation."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = e.select(
        F.col("event_type").alias("next"),
        F.lag("event_type").over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", "next").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    wsum = Window.partitionBy("prev")
    return trans.select(
        "prev",
        "next",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wsum)
        ).alias("prob"),
    )


RFM_ASOF = "2001-09-01 00:00:00"  # analysis date just past the order range


@query(
    "q_customer_rfm",
    oracle=f"""
    WITH base AS (
        SELECT o_custkey AS custkey,
               CAST(date_diff('day', MAX(o_orderdate),
                              TIMESTAMP '{RFM_ASOF}') AS BIGINT) AS recency_days,
               COUNT(*) AS frequency,
               ROUND(SUM({o_money_col("o_totalprice")}), 2) AS monetary
        FROM orders
        GROUP BY o_custkey
    )
    SELECT custkey, recency_days, frequency, monetary,
           CAST(NTILE(4) OVER (ORDER BY recency_days ASC, custkey ASC) AS INTEGER) AS r_quartile,
           CAST(NTILE(4) OVER (ORDER BY frequency DESC, custkey ASC) AS INTEGER) AS f_quartile,
           CAST(NTILE(4) OVER (ORDER BY monetary DESC NULLS LAST, custkey ASC) AS INTEGER) AS m_quartile
    FROM base
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic warehouse customer-value report:
    recency (days since last order at a fixed analysis date), frequency
    (order count), monetary (total spend), each quartiled with NTILE.

    Determinism: every NTILE ordering carries a custkey tie-break, so the
    quartile boundaries are exact cross-engine; monetary is a 2-decimal
    money sum (plain ROUND is exact per the registry rnd contract) folding
    the MONEY_MAX conformance guard in both twins (r9 raw-sum wave), and
    the ORDER is on the rounded value with the NULL position spelled
    explicitly (a customer whose every order is non-conforming has NULL
    monetary — NULLS LAST in both engines, then the custkey tie-break
    quartiles them deterministically). Scale shape: one
    per-customer aggregate (map-combinable), then three rank windows over
    the aggregated relation — |customers| rows, not |orders|; at true
    scale NTILE's single global ordering becomes the documented
    percentile-threshold rewrite (q_quality_quartile's pattern)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit(RFM_ASOF).cast("timestamp"), F.max("o_orderdate")
        ).cast("bigint").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        rnd(F.sum(money_col(F.col("o_totalprice")))).alias("monetary"),
    )
    wr = Window.orderBy(F.asc("recency_days"), F.asc("custkey"))
    wf = Window.orderBy(F.desc("frequency"), F.asc("custkey"))
    wm = Window.orderBy(F.desc_nulls_last("monetary"), F.asc("custkey"))
    return base.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(wr).alias("r_quartile"),
        F.ntile(4).over(wf).alias("f_quartile"),
        F.ntile(4).over(wm).alias("m_quartile"),
    )
