"""Self-run of the driver's t2 gate: every registered query with an oracle is
compared against DuckDB at sf0.001 and sf0.01 with the same discipline
(row-count + schema names + order-insensitive values). Rows-only queries are
just executed (must not raise, must return a stable schema)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED, SF_SMALL, duck_views, run_compare

import aws_etl_microservice_redshift_datalake_spark as engine


def _pairs():
    qs = engine.all_queries()
    oracles = engine.all_oracles()
    return [(name, qs[name], oracles.get(name)) for name in qs]


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED], ids=["sf0.001", "sf0.01"])
@pytest.mark.parametrize("case", _pairs(), ids=[n for n, _, _ in _pairs()])
def test_query_vs_oracle(spark, duck, case, sf_dir):
    name, fn, sql = case
    if sql is None:
        df = fn(spark, sf_dir)
        n = df.count()
        assert n >= 0
        assert len(df.schema.fields) > 0
    else:
        run_compare(spark, duck, name, fn, sql, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert len(qs) > 0
    assert set(osql).issubset(set(qs))
