"""CLI surface tests — no Spark session needed for list/oracle paths."""

from __future__ import annotations

from feature_store_test_spark.__main__ import main


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "queries" in out
    assert "[oracle" in out and "[rows-only" in out


def test_cli_oracle_prints_sql(capsys):
    assert main(["oracle", "q01_pricing_summary"]) == 0
    out = capsys.readouterr().out
    assert "GROUP BY l_returnflag" in out


def test_cli_oracle_rows_only_note(capsys):
    assert main(["oracle", "q37_approx_distinct"]) == 0
    assert "rows-only" in capsys.readouterr().out


def test_cli_unknown_query_suggests(capsys):
    assert main(["run", "q01_pricing_sumary"]) == 2
    assert "q01_pricing_summary" in capsys.readouterr().err


def test_cli_unknown_command(capsys):
    assert main(["frobnicate"]) == 2


def test_cli_help(capsys):
    assert main([]) == 0
    assert "Commands:" in capsys.readouterr().out
