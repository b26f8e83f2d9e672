"""CLI surface tests (reference parity: src/esco_cli.py subcommands)."""

from __future__ import annotations

import json

import pytest

from esco_neo4j_spark.cli import main


@pytest.fixture(autouse=True)
def _reuse_session(spark, monkeypatch, tmp_path):
    """CLI creates its own session; reuse the test session instead. Keep
    the A11 log sink inside the test tmpdir."""
    import esco_neo4j_spark.cli as cli

    monkeypatch.setattr(cli, "_spark", lambda args=None: spark)
    monkeypatch.setenv("SPARK_GRAFT_LOG_DIR", str(tmp_path / "logs"))


def test_list_queries(capsys):
    assert main(["list", "--json"]) == 0
    rows = json.loads(capsys.readouterr().out)
    names = {r["name"] for r in rows}
    assert {"aq_top_parts_by_lines", "dedup_minhash_lsh", "mm_decode_metadata"} <= names
    assert all({"oracle", "survey_ops", "corpus"} <= set(r) for r in rows)


def test_query_subcommand_json(capsys):
    rc = main(
        ["query", "aq_group_counts", "--sf-dir", "/root/testdata/sf0.001", "--json"]
    )
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert len(rows) > 0


def test_query_unknown_name(capsys):
    assert main(["query", "no_such_query"]) == 2


def test_search_subcommand(capsys):
    rc = main(["search", "analyse data", "--limit", "5", "--json"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert 0 < len(rows) <= 5
    assert {"uri", "label", "type", "score"} <= set(rows[0])
    # scores sorted descending
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_config_profile_load_and_log_sink(tmp_path, capsys):
    """A8 profile selection + A11 file log sink through the CLI."""
    cfg = tmp_path / "engine.yaml"
    cfg.write_text(
        "default:\n  shuffle_partitions: 7\n"
        "cluster:\n  shuffle_partitions: 99\n  log_level: 'INFO'\n"
        "sf_dir: '/root/testdata/sf0.001'\n"
    )
    logdir = tmp_path / "cli_logs"
    rc = main(
        ["--config", str(cfg), "--profile", "cluster",
         "--log-dir", str(logdir), "list", "--json"]
    )
    assert rc == 0
    log = (logdir / "esco.log").read_text()
    assert "command=list profile=cluster" in log


def test_translate_dry_run(capsys):
    rc = main(
        ["translate", "--node-type", "occupation", "--dry-run", "--limit", "5",
         "--json"]
    )
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    assert rows and any(
        r["preferredLabel_he"] and r["preferredLabel_he"].startswith("he:")
        for r in rows
        if r["preferredLabel_he"]
    )
