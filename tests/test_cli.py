"""CLI surface: list / run / explain over the declared registry."""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.__main__ import main


def test_list_runs_without_spark(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "flagship_daily_topk" in out
    assert "[oracle]" in out


def test_run_unknown_query_is_an_error(spark, capsys):
    assert main(["run", "no_such_query"]) == 2


def test_run_count_only(spark, capsys):
    rc = main(
        ["run", "distinct_scan", "--sf-dir", "/root/testdata/sf0.001",
         "--show", "0"]
    )
    assert rc == 0
    assert capsys.readouterr().out.strip().endswith("5")
