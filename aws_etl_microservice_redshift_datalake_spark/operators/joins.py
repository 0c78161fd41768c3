"""Join operators — SURVEY.md §2.3 J1-J7, J10 (J8/J9 live in events.py).

Reference parity: the Redshift join surface (public semantics; /root/reference
is empty — SURVEY.md §0). Spark maps Redshift's physical distribution choices
onto planner strategies: DISTSTYLE ALL ≈ broadcast hash join, DISTKEY
co-location ≈ shuffle hash / sort-merge on the key (SURVEY.md §4.2).

Scale notes (100 TB):
- Fact×fact joins (lineitem⋈orders) shuffle both sides on the key — that's
  correct and unavoidable; AQE coalesces partitions and splits skewed keys.
- Every dimension join below broadcasts explicitly (`F.broadcast`): nation /
  region / supplier / customer stay ≤ a few hundred MB even at 100 TB fact
  scale, so no shuffle of the big side.
- Semi/anti joins never materialize the build side's payload columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import exact_sum, money_col, o_exact_sum, o_money_col, query, rnd
from ..sources.io import load_table


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 200000.0::DOUBLE
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join (planner picks SMJ/shuffle-hash at scale)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: broadcast hash join on small dims (DISTSTYLE ALL analog) — the big
    side never shuffles; verify BroadcastHashJoin in .explain."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000.0::DOUBLE
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer join with a pushed join-side predicate — customers with
    no qualifying orders survive with NULLs (null handling is tested here;
    base data has zero nulls)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000.0)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_full_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_custkey
    FROM (SELECT * FROM customer WHERE c_custkey < 100) c
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey BETWEEN 50 AND 150) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3b: full outer join with unmatched rows on both sides."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 100)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey").between(50, 150))
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_custkey"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000.0::DOUBLE)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left semi join ≡ EXISTS. Build side reduced to keys only — at
    scale this is the cheapest existence filter."""
    c = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left anti join ≡ NOT EXISTS (customers with no orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: Cartesian product — only ever between bounded dims (5×25 here);
    unbounded cross joins are forbidden at scale by design."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey
     AND s.s_acctbal > c.c_acctbal + 4000.0::DOUBLE
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: theta join — equi part (nationkey) hashes/broadcasts, the
    inequality runs as a residual filter. Keeping an equi component is the
    scale-safe shape: pure inequality joins degrade to BNLJ."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    cond = (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal + 4000.0)
    return s.join(c, cond, "inner").select("s_suppkey", "s_name", "c_custkey")


@query(
    "q_star_join",
    oracle="""
    SELECT n.n_name,
           {rev} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_nationkey = c.c_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """.format(rev=o_exact_sum("l.l_extendedprice * (1.0::DOUBLE - l.l_discount)", 4)),
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: multi-way star join (TPC-H Q5 shape): fact⋈fact shuffle join on
    orderkey, then broadcast joins for every dimension; local-supplier
    condition correlates the two dim paths. AQE + CBO reorder freely."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            exact_sum(revenue, 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_join_right",
    oracle="""
    SELECT p.p_partkey, p.p_name, l.l_orderkey, l.l_quantity
    FROM (SELECT * FROM lineitem WHERE l_quantity >= 49.0::DOUBLE) l
    RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size > 40
    """,
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 (right half): right outer join — every large part survives even
    with no max-quantity shipment; planner treats it as the mirrored left
    join, so the same broadcast/shuffle strategies apply."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49.0)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") > 40)
    return li.join(p, li.l_partkey == p.p_partkey, "right").select(
        "p_partkey", "p_name", "l_orderkey", "l_quantity"
    )


SALT_BUCKETS = 8


@query(
    "q_join_salted",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_lines,
           ROUND(SUM({o_money_col("l_extendedprice")}), 2) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join — the manual remedy for a join key too hot for AQE's
    skew split (one key holding >> a partition's worth of rows): the FACT
    side adds a deterministic ROW-level salt and the DIM
    side replicates each row S times (explode over the salt domain), so
    the hot key's rows spread across S tasks and join on (key, salt).
    Results are identical to the plain join — the oracle IS the plain
    join — which is the point: salting is a physical rewrite, not a
    semantic one. The salt must be a function of the ROW, never of the
    join key alone: pmod(hash(key), S) hands every row of the hot key the
    SAME salt, so the pile-up just moves to (key, salt) — here the salt
    hashes (l_orderkey, l_linenumber), row-unique and deterministic. The shuffle hint pins a shuffle join so the salted path
    is actually exercised (a broadcast would bypass the salt); at real
    scale the dim side is S× bigger but still dim-sized. S = 8 here; in
    production S ≈ ceil(hot-key rows / target-partition rows)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    salted_fact = li.withColumn(
        "salt",
        F.pmod(
            F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_BUCKETS)
        ).cast("int"),
    )
    replicated_dim = o.withColumn(
        "salt",
        F.explode(F.array(*[F.lit(i) for i in range(SALT_BUCKETS)])),
    )
    joined = salted_fact.join(
        replicated_dim.hint("shuffle_hash"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (salted_fact.salt == replicated_dim.salt),
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        rnd(F.sum(money_col(F.col("l_extendedprice")))).alias("sum_price"),
    )
