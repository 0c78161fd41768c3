"""Data-quality audit operators: column profiling, FK orphan checks, key
uniqueness — the validation endpoints an ETL microservice exposes around
every load (profile the staged data, verify referential integrity, verify
key constraints) before/after COPY into the warehouse.

Reference parity: Redshift itself enforces neither PK nor FK constraints
(they are informational), so warehouse ETL services run exactly these
queries as explicit post-load checks (public semantics; /root/reference is
empty — SURVEY.md §0).

Spark-first design:

- Profiling is ONE wide aggregate over one scan (count/count-nulls/
  count-distinct/min/max for every column simultaneously), pivoted to tall
  with ``stack`` — a row-local Expand, no extra shuffle, no per-column
  passes. At 100 TB the single-scan property is the whole point: profiling
  N columns costs one read, not N.
- FK orphan counts are left-anti hash joins (child minus parent key set) —
  each a broadcast when the parent is a dimension.
- Uniqueness is groupBy(key) with a two-level aggregate (total rows,
  distinct keys, keys seen more than once) — map-side partials do the
  heavy lifting.

All outputs are integer counts / raw doubles (min/max are order-insensitive
exact), so every query is fully hash-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import exact_sum, query
from ..sources.io import load_spread, load_table

# lineitem profile targets: (column, is_numeric) — numeric min/max reported
# as DOUBLE, key/string columns profile counts only
_PROFILE_COLS = [
    ("l_orderkey", True),
    ("l_partkey", True),
    ("l_suppkey", True),
    ("l_quantity", True),
    ("l_extendedprice", True),
    ("l_discount", True),
    ("l_tax", True),
    ("l_returnflag", False),
    ("l_linestatus", False),
]


def _profile_oracle() -> str:
    parts = []
    for col, is_num in _PROFILE_COLS:
        mn = f"CAST(MIN({col}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"CAST(MAX({col}) AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        parts.append(
            f"SELECT '{col}' AS col_name, COUNT(*) AS n_rows,"
            f" COUNT(*) - COUNT({col}) AS n_nulls,"
            f" COUNT(DISTINCT {col}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num FROM lineitem"
        )
    return "\nUNION ALL\n".join(parts)


def _profile(df: DataFrame, cols: list[tuple[str, bool]]) -> DataFrame:
    """One-scan wide aggregate over (column, is_numeric) targets, pivoted
    tall with ``stack`` — shared by the oracled lineitem query and the
    generic any-table CLI profile."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, is_num in cols:
        aggs.append(F.count(F.col(col)).alias(f"nn_{col}"))
        aggs.append(F.countDistinct(F.col(col)).alias(f"nd_{col}"))
        if is_num:
            aggs.append(F.min(F.col(col)).cast("double").alias(f"mn_{col}"))
            aggs.append(F.max(F.col(col)).cast("double").alias(f"mx_{col}"))
    wide = df.agg(*aggs)
    stack_args = []
    for col, is_num in cols:
        mn = f"mn_{col}" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{col}" if is_num else "CAST(NULL AS DOUBLE)"
        stack_args.append(
            f"'{col}', n_rows, n_rows - nn_{col}, nd_{col}, {mn}, {mx}"
        )
    return wide.selectExpr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
    )


def profile_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Generic one-scan profile of any driver table: numeric columns get
    min/max, every column gets row/null/distinct counts. Columns are read
    from the schema, so this is the CLI/service profiling endpoint."""
    df = load_table(spark, sf_dir, table)
    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float"}
    cols = [
        (f.name, f.dataType.simpleString() in numeric or
         f.dataType.simpleString().startswith("decimal"))
        for f in df.schema.fields
        if not f.dataType.simpleString().startswith(("array", "struct", "map", "binary"))
    ]
    return _profile(df, cols)


@query("q_dq_profile", oracle=_profile_oracle())
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of lineitem: row/null/distinct counts for every column
    plus numeric min/max — computed in ONE wide aggregate over one scan
    (the oracle's UNION-ALL-of-scalar-aggs form is the semantic spec; the
    Spark plan reads the table once), then pivoted tall with ``stack``."""
    # load_spread: the exact count-distinct Expand is compute-bound, and a
    # single-file scan pins it to one core (measured 4.67 s -> 2.98 s at
    # sf0.1 with the metadata-gated repartition; a multi-file corpus skips it)
    return _profile(load_spread(spark, sf_dir, "lineitem"), _PROFILE_COLS)


# FK graph of the star schema: (name, child, child_key, parent, parent_key)
_FK_EDGES = [
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer.nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.nationkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.regionkey", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _orphans_oracle() -> str:
    # IS NOT NULL on both sides of the membership test (r7 degraded-twin
    # gate): an orphan is a NON-NULL child key with no parent — a NULL FK
    # is a missing value, not an orphan. NOT IN silently implied this for
    # NULL child keys (NULL NOT IN ... is never TRUE) but would also
    # collapse to zero orphans if any parent key were NULL; the explicit
    # spelling matches the Spark side's filter exactly.
    parts = [
        f"SELECT '{name}' AS relation, COUNT(*) AS n_orphans,"
        f" (SELECT COUNT(*) FROM {child}) AS n_child_rows"
        f" FROM {child} WHERE {ckey} IS NOT NULL"
        f" AND {ckey} NOT IN (SELECT {pkey} FROM {parent} WHERE {pkey} IS NOT NULL)"
        for name, child, ckey, parent, pkey in _FK_EDGES
    ]
    return "\nUNION ALL\n".join(parts)


@query("q_dq_fk_orphans", oracle=_orphans_oracle())
def q_dq_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan count for every FK edge of the
    star schema (NON-NULL child keys with no parent row), as left-anti hash
    joins — the parent key set broadcasts for dimension-sized parents. The
    fixture has zero orphans everywhere (FIXTURES.md), which is exactly
    what the audit must report. A NULL FK is a missing value, not an
    orphan (r7 degraded-twin gate: the anti-join counted NULL keys — which
    never equi-join — as orphans, while the oracle's NOT IN never did)."""
    out = None
    for name, child, ckey, parent, pkey in _FK_EDGES:
        ch = load_table(spark, sf_dir, child)
        pa = load_table(spark, sf_dir, parent).select(pkey)
        orphans = (
            ch.filter(F.col(ckey).isNotNull())
            .join(pa, F.col(ckey) == pa[pkey], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        # total child rows: a second 1-row aggregate cross-joined (both
        # sides are single rows — the join is a broadcast of one tuple)
        total = ch.agg(F.count(F.lit(1)).alias("n_child_rows"))
        row = orphans.crossJoin(total).select(
            F.lit(name).alias("relation"), "n_orphans", "n_child_rows"
        )
        out = row if out is None else out.unionByName(row)
    return out


_UNIQ_TABLES = [
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
]


def _uniqueness_oracle() -> str:
    parts = [
        f"SELECT '{tbl}' AS tbl, COUNT(*) AS n_rows,"
        f" COUNT(DISTINCT {key}) AS n_keys,"
        f" (SELECT COUNT(*) FROM (SELECT {key} FROM {tbl}"
        f"   GROUP BY {key} HAVING COUNT(*) > 1) d) AS n_dup_keys"
        f" FROM {tbl}"
        for tbl, key in _UNIQ_TABLES
    ]
    return "\nUNION ALL\n".join(parts)


@query("q_dq_uniqueness", oracle=_uniqueness_oracle())
def q_dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit for every keyed table: row count,
    distinct keys, and number of duplicated keys. Spark route: one
    groupBy(key).count() per table feeding both the distinct-key count and
    the duplicate count — map-side partial aggregation collapses the scan
    to one shuffle of pre-aggregated key counts."""
    out = None
    for tbl, key in _UNIQ_TABLES:
        per_key = (
            load_table(spark, sf_dir, tbl)
            .groupBy(F.col(key))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # coalesce: on an EMPTY table the per-key relation has no rows, so
        # the SUMs are NULL — but an audit of zero rows must report 0, not
        # "unknown" (the oracle's COUNTs do; r8 empty-input mirror, no-op
        # on any non-empty table)
        row = per_key.agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)), F.lit(0)
            ).alias("n_dup_keys"),
        ).select(
            F.lit(tbl).alias("tbl"),
            F.col("n_rows").cast("long"),
            "n_keys",
            F.col("n_dup_keys").cast("long"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query("q_dq_profile_approx", oracle=None)
def q_dq_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profiling path: same one-scan shape as q_dq_profile but
    with approx_count_distinct (HLL++) instead of exact distincts — no
    Expand row multiplication, constant sketch memory per column, one
    ordinary two-phase aggregate. Rows-only by design (sketch estimates are
    engine-specific — SURVEY §5.3); tests/test_quality.py bounds its error
    against the exact profile."""
    li = load_spread(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, is_num in _PROFILE_COLS:
        aggs.append(F.count(F.col(col)).alias(f"nn_{col}"))
        aggs.append(F.approx_count_distinct(F.col(col)).alias(f"nd_{col}"))
        if is_num:
            aggs.append(F.min(F.col(col)).cast("double").alias(f"mn_{col}"))
            aggs.append(F.max(F.col(col)).cast("double").alias(f"mx_{col}"))
    wide = li.agg(*aggs)
    stack_args = []
    for col, is_num in _PROFILE_COLS:
        mn = f"mn_{col}" if is_num else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{col}" if is_num else "CAST(NULL AS DOUBLE)"
        stack_args.append(f"'{col}', n_rows, n_rows - nn_{col}, nd_{col}, {mn}, {mx}")
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
    )


@query(
    "q_chi_square",
    oracle="""
    WITH cells AS (SELECT lang, source, COUNT(*) AS c FROM documents GROUP BY 1, 2),
    rl AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY 1),
    cs AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM documents),
    grid AS (
        SELECT rl.lang, cs.source, rl.nl, cs.ns,
               COALESCE(cells.c, 0) AS obs
        FROM rl CROSS JOIN cs
        LEFT JOIN cells ON cells.lang = rl.lang AND cells.source = cs.source
    ),
    contrib AS (
        SELECT lang, source,
               (CAST(nl AS DOUBLE) * ns) / tot.n AS e,
               CAST(obs AS DOUBLE) - (CAST(nl AS DOUBLE) * ns) / tot.n AS d
        FROM grid CROSS JOIN tot
    )
    SELECT CAST(ROUND(SUM(CAST(ROUND((d * d) / e, 6) AS DECIMAL(27,6))), 3) AS DOUBLE) AS chi2,
           (COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1) AS dof,
           (SELECT n FROM tot) AS n_total
    FROM contrib
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between lang and source — the
    corpus-balance diagnostic a curation pipeline runs to detect that some
    sources are language-skewed (a provenance/contamination smell). Full
    observed-vs-expected grid INCLUDING zero cells (absent (lang, source)
    combos still contribute their expectation — skipping them understates
    the statistic).

    Float discipline: every per-cell term is built from integer counts with
    one fixed parenthesization ((nl·ns)/N, obs−e, (d·d)/e — all correctly
    rounded IEEE ops on bit-identical operands), so cells match
    cross-engine exactly; only the cross-CELL sum is order-nondeterministic
    and rides exact_sum (round to the 1e-6 grid, exact decimal sum, round
    once). Scale shape: three tiny aggregates (|langs|, |sources|,
    |langs|x|sources| rows) broadcast into a 100-row grid — the corpus is
    scanned once for the cell counts and never shuffled."""
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    rl = d.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    cs = d.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    grid = (
        rl.crossJoin(F.broadcast(cs))
        .join(F.broadcast(cells), ["lang", "source"], "left")
        .select("lang", "source", "nl", "ns", F.coalesce("c", F.lit(0)).alias("obs"))
        .crossJoin(F.broadcast(tot))
    )
    e = (F.col("nl").cast("double") * F.col("ns")) / F.col("n")
    dd = F.col("obs").cast("double") - e
    contrib = grid.select(
        "lang", "source", "n", ((dd * dd) / e).alias("x")
    )
    return contrib.agg(
        exact_sum(F.col("x"), 6, 3).alias("chi2"),
        ((F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)).alias("dof"),
        # coalesce: on an EMPTY corpus (a stray all-filtered partition) the
        # grid has no cells, so min(n) is NULL — but the true corpus count
        # is 0, which is what the oracle's scalar subquery reports (r8
        # empty-input mirror; no-op whenever any cell exists)
        F.coalesce(F.min("n"), F.lit(0)).alias("n_total"),
    )
