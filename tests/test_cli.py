"""CLI entrypoint (__main__.py) — the service-API analog: list/run/sql/
profile subcommands drive the same registry the driver contract exposes."""

from __future__ import annotations

from aws_etl_microservice_redshift_datalake_spark.__main__ import main

from tests.conftest import SF_SMALL


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert any(l.startswith("q_pricing_summary\tsql-oracle") for l in out)
    assert len(out) >= 100


def test_cli_run_query(spark, capsys):
    assert main(["run", "q_pricing_summary", "--sf-dir", SF_SMALL]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].split("\t")[:2] == ["l_returnflag", "l_linestatus"]
    assert len(out) > 1


def test_cli_run_unknown_query(capsys):
    assert main(["run", "q_no_such_thing"]) == 2


def test_cli_run_explain(spark, capsys):
    assert main(["run", "q_join_broadcast", "--sf-dir", SF_SMALL, "--explain"]) == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_cli_sql(spark, capsys):
    assert main(["sql", "SELECT COUNT(*) AS n FROM region", "--sf-dir", SF_SMALL]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["n", "5"]


def test_cli_profile(spark, capsys):
    assert main(["profile", "events", "--sf-dir", SF_SMALL]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].startswith("col_name\t")
    assert any(l.startswith("event_id\t1000\t0\t1000") for l in out)
