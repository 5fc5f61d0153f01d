"""CLI entry point: list / run / error paths (getOrCreate reuses the
test session, so `run` is cheap here)."""

from __future__ import annotations

from dimagi_data_platform_spark.__main__ import main
from dimagi_data_platform_spark.plans.queries import QUERIES
from tests.conftest import SF_SMALL


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert set(out) == set(QUERIES)


def test_cli_unknown_query():
    assert main(["run", "no_such_query", "--sf-dir", SF_SMALL]) == 2


def test_cli_run_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "cli_out")
    assert main(["run", "q6_revenue_delta", "--sf-dir", SF_SMALL, "--out", out]) == 0
    assert spark.read.parquet(out).count() == 1
