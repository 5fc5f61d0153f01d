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


def test_cli_etl_runs_from_json_config(spark, tmp_path, capsys):
    """The declarative entrypoint: `etl --config x.json` drives the
    composed pipeline and prints the run report."""
    import json

    from dimagi_data_platform_spark.catalog import load_table
    from dimagi_data_platform_spark.sources.versioned import read_version

    src = str(tmp_path / "ev")
    load_table(spark, SF_SMALL, "events").write.parquet(src)
    wh = str(tmp_path / "wh")
    cfgp = tmp_path / "etl.json"
    cfgp.write_text(json.dumps({"source_events": src, "warehouse": wh}))
    assert main(["etl", "--config", str(cfgp)]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_ingested"] > 0 and "watermark_after" in report
    assert read_version(spark, f"{wh}/monthly_usage").count() > 0
