"""Physical-plan audit helpers — the engine's `.explain()` discipline as code.

Reference parity: Redshift exposes EXPLAIN / system tables for plan review
(public semantics; /root/reference is empty — SURVEY.md §0); here the
equivalent surface is Spark's formatted plan, parsed into assertions so the
test suite can LOCK IN the physical properties that matter at 100 TB:

- filters reach the parquet scan (`PushedFilters`) — zone-map analog;
- scans read only the referenced columns (`ReadSchema`) — column pruning;
- small dimensions broadcast, big sides never do;
- shuffle (Exchange) count stays at the plan's designed minimum;
- no row-at-a-time Python (`BatchEvalPython`) sneaks into a hot path —
  Arrow-batched (`ArrowEvalPython` / `MapInPandas`) is the only sanctioned
  Python execution mode.

Every audit works on the ANALYZED plan of a lazy DataFrame — nothing here
executes a job (AQE finalization is runtime-only, so broadcast decisions
made by AQE at runtime are asserted separately in tests that do execute).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (no execution)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that appear in the plan's parquet scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_str(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings per scan — what each scan actually reads."""
    return re.findall(r"ReadSchema: (struct<[^>]*>)", plan_str(df))


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators (excludes broadcast exchanges).
    Every one of these is a full data movement at scale — the audit number
    to hold at the plan's designed minimum.

    Counts on the SIMPLE-mode plan: formatted mode moves an Exchange's
    partitioning spec to the details section, which silently zeroes a naive
    regex count (found the hard way — keep this on simple mode). Distinct
    plan_ids only: a materialized InMemoryRelation re-renders its build plan
    once per reference, so a raw line count over-reports cached subtrees."""
    p = plan_str(df, "simple")
    hits = re.findall(
        r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)"
        r"[^\n]*?\[plan_id=(\d+)\]",
        p,
    )
    if hits:
        return len(set(hits))
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", p
        )
    )


def count_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan_str(df, "simple")))


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_str(df, "simple")


def python_eval_modes(df: DataFrame) -> set[str]:
    """Python execution operators present in the plan. Row-at-a-time
    ('BatchEvalPython') is the anti-pattern; Arrow modes are sanctioned."""
    p = plan_str(df)
    found = set()
    for op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        if op in p:
            found.add(op)
    return found


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen span count — fewer, wider spans = more of the plan
    runs as fused JVM bytecode. Simple mode marks codegen stages as `*(N)`.
    NOTE: under AQE the marks only appear once the plan is finalized, and
    only an action on THIS DataFrame's own QueryExecution finalizes it
    (``df.collect()``; a ``df.count()`` builds a new wrapping QE and leaves
    this one lazy) — a lazy DataFrame reports 0."""
    return len(set(re.findall(r"\*\((\d+)\)", plan_str(df, "simple"))))


def assert_scan_pruned(df: DataFrame, must_not_read: list[str]) -> None:
    """Assert column pruning: none of the named columns appear in any scan's
    ReadSchema."""
    schemas = read_schemas(df)
    assert schemas, "no parquet scans found in plan"
    for col in must_not_read:
        for s in schemas:
            assert f"{col}:" not in s, f"column {col} not pruned: scan reads {s}"


def assert_filter_pushed(df: DataFrame, column: str) -> None:
    """Assert some pushed filter references the column (zone-map skipping is
    only possible when the predicate reaches the scan)."""
    flt = pushed_filters(df)
    assert any(column in f for f in flt), (
        f"no pushed filter mentions {column}; pushed: {flt}"
    )


def assert_no_row_python(df: DataFrame) -> None:
    """Assert the plan contains no row-at-a-time Python evaluation."""
    modes = python_eval_modes(df)
    assert "BatchEvalPython" not in modes, (
        f"row-at-a-time Python UDF in plan (modes={modes})"
    )
