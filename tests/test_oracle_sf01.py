"""sf0.1 oracle spot-checks for the dedup family — the ONLY scale factor
whose corpus contains true duplicates (8 exact dups, FIXTURES.md), so the
interesting branches (non-empty pair sets, multi-member clusters, drop sets
that actually drop) are exercised against DuckDB only here. The regular t2
self-gate runs sf0.001/sf0.01 where these queries return empty/trivial
shapes."""

from __future__ import annotations

import pytest

from tests.conftest import SF_BENCH, run_compare

import aws_etl_microservice_redshift_datalake_spark as engine

# the queries whose behavior is qualitatively different with dups present
DEDUP_FAMILY = [
    "q_dedup_exact",
    "q_dedup_hash",
    "q_dedup_minhash_pairs",
    "q_ngram_jaccard",
    "q_dedup_clusters",
    "q_training_pipeline",
    "q_simhash",
    "q_dedup_substring",  # r6: whole-doc duplicated runs only exist here
]

# queries with a size-gated branch that only activates at sf0.1: the packing
# shard key floor(doc_id / PACK_SHARD=4096) is constant 0 at sf0.001/sf0.01
# (≤ 500 docs), so the multi-shard window partitioning — the property the
# shard exists for — is oracle-verified only here (5000 docs → shards 0, 1)
SCALE_BRANCH_FAMILY = ["q_pack_sequences"]


@pytest.mark.parametrize("name", DEDUP_FAMILY + SCALE_BRANCH_FAMILY)
def test_dedup_family_vs_oracle_at_sf01(spark, duck, name):
    qs = engine.all_queries()
    oracles = engine.all_oracles()
    run_compare(spark, duck, name, qs[name], oracles[name], SF_BENCH)


def test_sf01_actually_has_duplicates(spark, duck):
    """Guard: if the fixture ever regenerates without dups, the family above
    silently degrades to the trivial shape — fail loudly instead."""
    from tests.conftest import duck_views

    duck_views(duck, SF_BENCH)
    n, d = duck.execute(
        "SELECT COUNT(*), COUNT(DISTINCT text) FROM documents"
    ).fetchone()
    assert n > d, "sf0.1 documents should contain duplicate texts"
