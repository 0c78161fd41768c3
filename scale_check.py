#!/usr/bin/env python3
"""Scale-stress check: amplify the sf0.1 tables ~10× (preserving join
structure and key skew shape), run the headline operators at both scales on
the same session, and write SCALE.md with wall-clock scaling factors.

The point: show each operator's cost grows ~linearly with data (shuffle-
minimal plans), not quadratically — the measurable stand-in for "would this
hold at 1000 executors / 100 TB". Run: ``python scale_check.py``.

Amplification: each fact row is replicated K times with key offsets that
keep referential integrity (orderkey/custkey/event user_id spaces shift per
replica; dimension tables stay fixed, as they would at 100 TB). Documents
get per-replica doc_id offsets with text perturbed by a replica tag so dedup
finds the SAME duplicate structure per replica, K× total.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

K = int(os.environ.get("SPARK_GRAFT_SCALE_K", "10"))
BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = f"/root/repo/.tmp/scale-x{K}"

QUERIES = [
    "q_pricing_summary",
    "q_star_join",
    "q_join_inner",
    "q_agg_salted",
    "q_window_topk",
    "q_join_asof",
    "q_sessionize",
    "q_dedup_minhash_pairs",
    "q_tfidf_top_terms",
    "q_ann_topk",
    # round 2: the former scale-killers, now bucketed/capped — tracked here to
    # show sub-quadratic growth at 10×
    "q_ngram_jaccard",
    "q_cosine_neardup",
    "q_knn_classify",
]


def amplify(spark) -> None:
    from pyspark.sql import functions as F

    from aws_etl_microservice_redshift_datalake_spark.sources.io import load_table

    if os.path.exists(f"{OUT}/_DONE"):
        return
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(K - 1))).alias("rep")

    def key_shift(col, span):
        return (F.col(col) + F.col("rep") * span).alias(col)

    li = load_table(spark, BASE, "lineitem").select("*", rep)
    li = li.select(
        key_shift("l_orderkey", 10_000_000),
        *[c for c in li.columns if c not in ("l_orderkey", "rep")],
    )
    li.repartition(32).write.parquet(f"{OUT}/lineitem.parquet")

    o = load_table(spark, BASE, "orders").select("*", rep)
    o = o.select(
        key_shift("o_orderkey", 10_000_000),
        key_shift("o_custkey", 1_000_000),
        *[c for c in o.columns if c not in ("o_orderkey", "o_custkey", "rep")],
    )
    o.repartition(16).write.parquet(f"{OUT}/orders.parquet")

    c = load_table(spark, BASE, "customer").select("*", rep)
    c = c.select(
        key_shift("c_custkey", 1_000_000),
        *[col for col in c.columns if col not in ("c_custkey", "rep")],
    )
    c.repartition(8).write.parquet(f"{OUT}/customer.parquet")

    e = load_table(spark, BASE, "events").select("*", rep)
    e = e.select(
        key_shift("event_id", 100_000_000),
        key_shift("user_id", 1_000_000),
        *[col for col in e.columns if col not in ("event_id", "user_id", "rep")],
    )
    e.repartition(16).write.parquet(f"{OUT}/events.parquet")

    d = load_table(spark, BASE, "documents").select("*", rep)
    d = d.select(
        key_shift("doc_id", 10_000_000),
        F.concat(F.col("text"), F.lit(" replica"), F.col("rep").cast("string")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + F.lit(9)).alias("n_chars"),
    )
    d.repartition(8).write.parquet(f"{OUT}/documents.parquet")

    emb = load_table(spark, BASE, "embeddings").select("*", rep)
    emb = emb.select(
        key_shift("vec_id", 10_000_000),
        *[col for col in emb.columns if col not in ("vec_id", "rep")],
    )
    emb.repartition(8).write.parquet(f"{OUT}/embeddings.parquet")

    for t in ("region", "nation", "supplier", "part"):
        load_table(spark, BASE, t).write.parquet(f"{OUT}/{t}.parquet")
    open(f"{OUT}/_DONE", "w").write("ok")


def run(spark, qs, sf_dir: str) -> dict[str, float]:
    times = {}
    for name in QUERIES:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def main() -> None:
    from aws_etl_microservice_redshift_datalake_spark import all_queries, get_session

    spark = get_session("scale-check")
    qs = all_queries()
    print(f"amplifying {BASE} x{K} -> {OUT}", file=sys.stderr)
    amplify(spark)

    # warm + measure base, then amplified
    qs["q_pricing_summary"](spark, BASE).count()
    base_t = run(spark, qs, BASE)
    big_t = run(spark, qs, OUT)

    lines = [
        "# SCALE — wall-clock scaling of headline operators",
        "",
        f"Same session, same plans: sf0.1 vs a {K}× amplified copy "
        "(key-shifted replicas; dims fixed; dup structure preserved). A "
        "shuffle-minimal operator should scale ≈ linearly in rows (factor "
        f"≈ {K} or below on 32 cores as fixed overhead amortizes); "
        "super-linear growth flags a pairwise/quadratic plan. Regenerate: "
        "`python scale_check.py`.",
        "",
        "| query | sf0.1 (s) | ×" + str(K) + " (s) | factor |",
        "| --- | --- | --- | --- |",
    ]
    for name in QUERIES:
        f = big_t[name] / base_t[name] if base_t[name] > 0 else float("nan")
        lines.append(f"| {name} | {base_t[name]:.2f} | {big_t[name]:.2f} | {f:.1f}× |")
    lines += [
        "",
        "Notes: `q_dedup_minhash_pairs` and `q_ngram_jaccard` candidate volume",
        "grows with duplicate density (each replica contributes its own",
        f"near-dup pairs — output is {K}× pairs, not {K}²; the n-gram variant",
        "additionally caps posting lists at DF ≤ 50 so hot shingles cannot go",
        "quadratic); `q_cosine_neardup` candidates come from the LSH bucket",
        "self-join (L=16/k=8), never all-pairs; `q_ann_topk`/`q_knn_classify`",
        "are linear in corpus size by construction (broadcast queries ×",
        "streamed targets).",
        "",
    ]
    open("/root/repo/SCALE.md", "w").write("\n".join(lines))
    print(json.dumps({"base": base_t, "amplified": big_t, "k": K}))


if __name__ == "__main__":
    main()
