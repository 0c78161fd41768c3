"""Similarity search over the embeddings table — SURVEY.md §2.10 L4/L5 plus
cosine near-dup and an LSH-bucketed ANN variant.

Reference parity: LLM-data-pipeline extension (BASELINE.json north star;
/root/reference is empty — SURVEY.md §0). Vectors are dim-64 and
L2-normalized (FIXTURES.md), so cosine similarity ≡ dot product.

Scale notes (100 TB):
- The brute-force path broadcasts the (small) QUERY set and streams the
  (huge) target side — a broadcast nested loop where the big side never
  shuffles; per-row cost is a 64-wide fused JVM expression (zip_with +
  aggregate), no Python.
- The scale path (q_ann_lsh_topk) buckets vectors by random-hyperplane signs
  (SimHash for vectors): candidates come from the query's bucket only, an
  equi-join. Recall < 1 by construction — it's declared rows-only and its
  recall is measured in pytest against the brute-force truth.
- All dot products run in DOUBLE (float32 inputs upcast first): engines then
  agree to the ulp, and ranking uses raw sims with vec_id tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.io import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embeddings table, repartitioned to the session's parallelism: it
    ships as one parquet file, so without this every dot-product scan runs on
    a single core. At cluster scale the same call spreads the (huge) target
    side across executors while queries stay broadcast."""
    return load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@query(
    "q_ann_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    t AS (SELECT vec_id AS t_id, label, embedding::DOUBLE[] AS tv FROM embeddings),
    scored AS (
        SELECT q_id, t_id, label,
               list_inner_product(qv, tv) AS sim,
               ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY list_inner_product(qv, tv) DESC, t_id ASC) AS rn
        FROM q CROSS JOIN t
        WHERE q_id <> t_id
    )
    SELECT q_id, t_id, label, ROUND(sim, 4) AS sim, CAST(rn AS INTEGER) AS rank
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: brute-force cosine top-k — for each query vector (vec_id < 10) the
    5 nearest neighbors by dot product (≡ cosine on unit vectors), self
    excluded. Broadcast queries × streamed targets; rank on raw sims with
    t_id tie-break, sims rounded only for output."""
    e = _embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), _as_double("embedding").alias("qv")
    )
    t = e.select(
        F.col("vec_id").alias("t_id"), "label", _as_double("embedding").alias("tv")
    )
    scored = (
        t.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("t_id"))
        .select("q_id", "t_id", "label", _dot(F.col("qv"), F.col("tv")).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("t_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "t_id", "label", F.round("sim", 4).alias("sim"), "rank")
    )


@query(
    "q_knn_classify",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, label AS true_label, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 50),
    t AS (SELECT vec_id AS t_id, label, embedding::DOUBLE[] AS tv FROM embeddings),
    neigh AS (
        SELECT q_id, true_label, label,
               ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY list_inner_product(qv, tv) DESC, t_id ASC) AS rn
        FROM q CROSS JOIN t WHERE q_id <> t_id
    ), votes AS (
        SELECT q_id, true_label, label, COUNT(*) AS n_votes
        FROM neigh WHERE rn <= 10
        GROUP BY q_id, true_label, label
    ), pred AS (
        SELECT q_id, true_label, label AS pred_label FROM (
            SELECT q_id, true_label, label, n_votes,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY n_votes DESC, label ASC) AS rn
            FROM votes
        ) WHERE rn = 1
    )
    SELECT q_id AS vec_id, true_label, pred_label,
           true_label = pred_label AS is_correct
    FROM pred
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: 10-NN majority-vote label check for vec_id < 50 — exercises the
    ANN pipeline end-to-end (neighbors → votes → argmax with label asc
    tie-break) and compares predicted vs true label."""
    e = _embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        _as_double("embedding").alias("qv"),
    )
    t = e.select(F.col("vec_id").alias("t_id"), "label", _as_double("embedding").alias("tv"))
    w_sim = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("t_id"))
    neigh = (
        t.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("t_id"))
        .select("q_id", "t_id", "true_label", "label", _dot(F.col("qv"), F.col("tv")).alias("sim"))
        .withColumn("rn", F.row_number().over(w_sim))
        .filter(F.col("rn") <= 10)
    )
    votes = neigh.groupBy("q_id", "true_label", "label").agg(F.count(F.lit(1)).alias("n_votes"))
    w_vote = Window.partitionBy("q_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w_vote))
        .filter(F.col("rn") == 1)
        .select(
            F.col("q_id").alias("vec_id"),
            "true_label",
            F.col("label").alias("pred_label"),
            (F.col("true_label") == F.col("label")).alias("is_correct"),
        )
    )


@query(
    "q_cosine_neardup",
    oracle="""
    WITH t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_inner_product(a.v, b.v), 4) AS sim
    FROM t a JOIN t b ON a.vec_id < b.vec_id
    WHERE list_inner_product(a.v, b.v) >= 0.8
    """,
)
def q_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim ≥ 0.8). On this corpus the
    max off-diagonal cosine is ~0.6, so the correct answer is empty — the
    operator still exercises the full pairwise-similarity plan. At 100 TB
    the pairwise form is replaced by LSH bucketing (q_ann_lsh_topk's shape)
    feeding the same verify-filter."""
    e = _embeddings(spark, sf_dir)
    t = e.select("vec_id", _as_double("embedding").alias("v"))
    a = t.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = t.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    sim = _dot(F.col("va"), F.col("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", sim.alias("sim_raw"))
        .filter(F.col("sim_raw") >= 0.8)
        .select("vec_a", "vec_b", F.round("sim_raw", 4).alias("sim"))
    )


N_TABLES = 8  # L independent hash tables
N_BITS = 4  # k hyperplane sign bits per table


@query("q_ann_lsh_topk")  # rows-only: approximate recall is the contract, not equality
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 scale path: multi-table random-hyperplane LSH ANN (the standard
    L-tables × k-bits construction; Charikar '02 / Indyk-Motwani '98).

    Each vector hashes to one k-bit sign bucket per table (deterministic
    pseudo-random hyperplanes: plane p, dim i weight = ((p*64+i)*2654435761
    mod 1000)/500 - 1); candidates are target vectors sharing a (table,
    bucket) pair with the query — an equi-join per table instead of a cross
    join — then exact dot-product re-ranking of the (deduplicated) candidate
    union. Recall for neighbors at cosine s is 1-(1-p^k)^L with
    p = 1 - arccos(s)/π: k=4/L=8 gives ≳0.95 at s=0.7. At 100 TB, raise k
    (finer buckets, bounded candidate sets) and L together to hold recall —
    candidate generation stays equi-join-shaped, never pairwise.
    Rows-only by design; tests/test_quality.py enforces the recall floor
    against brute-force truth.
    """
    e = _embeddings(spark, sf_dir)

    def plane_weight(p: int, i: int) -> float:
        return (((p * 64 + i) * 2654435761) % 1000) / 500.0 - 1.0

    v = _as_double("embedding")

    def table_bucket(t: int):
        """k sign bits from planes [t*k, t*k + k) packed into an int."""
        bucket = None
        for j in range(N_BITS):
            p = t * N_BITS + j
            terms = None
            for i in range(64):
                term = F.element_at(v, i + 1) * F.lit(plane_weight(p, i))
                terms = term if terms is None else terms + term
            bit = F.when(terms > 0, F.lit(1 << j)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        return bucket

    tables = F.array(
        *[
            F.struct(F.lit(t).alias("tbl"), table_bucket(t).alias("bkt"))
            for t in range(N_TABLES)
        ]
    )
    t_side = e.select(
        F.col("vec_id").alias("t_id"), "label", v.alias("tv"),
        F.explode(tables).alias("tb"),
    ).select("t_id", "label", "tv", "tb.tbl", "tb.bkt")
    q_side = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("q_id"), v.alias("qv"), F.explode(tables).alias("tb"))
        .select("q_id", "qv", "tb.tbl", "tb.bkt")
    )
    # candidate union across tables, deduped before the (expensive) re-rank
    cand = (
        t_side.join(F.broadcast(q_side), ["tbl", "bkt"])
        .filter(F.col("q_id") != F.col("t_id"))
        .select("q_id", "qv", "t_id", "label", "tv")
        .dropDuplicates(["q_id", "t_id"])
    )
    scored = cand.select(
        "q_id", "t_id", "label", _dot(F.col("qv"), F.col("tv")).alias("sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("t_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "t_id", "label", F.round("sim", 4).alias("sim"), "rank")
    )
