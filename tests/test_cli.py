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
    out = json.loads(capsys.readouterr().out)
    # reference JSON envelope (src/esco_cli.py:349-360)
    assert set(out) == {"query", "results", "related_graph"}
    assert out["query"] == "analyse data"
    rows = out["results"]
    assert 0 < len(rows) <= 5
    assert {"uri", "label", "type", "description", "score"} <= set(rows[0])
    # scores sorted descending
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_search_terminal_format(capsys, monkeypatch):
    """r8 (A9 parity, reference src/esco_cli.py:36-91): color-coded
    header/section layout, numbered '[Type] label (Score: x.xxxx)'
    results, 100-char description truncation — plain text when NO_COLOR
    / non-tty."""
    monkeypatch.setenv("NO_COLOR", "1")
    rc = main(["search", "analyse data", "--limit", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert " ESCO Semantic Search " in out and "=" * 80 in out
    assert "Query: analyse data" in out
    assert " Searching... " in out and " Search Results " in out
    assert "1. [" in out and "(Score: 0." in out
    assert "\033[" not in out, "NO_COLOR must strip ANSI codes"
    # truncated descriptions never exceed 100 chars and end with ...
    for line in out.splitlines():
        if line.startswith("   Description: "):
            desc = line[len("   Description: "):]
            assert len(desc) <= 100
            if len(desc) == 100:
                assert desc.endswith("...")


def test_search_related_truncation(capsys, monkeypatch):
    """r8 (A9): the related-entities block prints the first 5 labels per
    relationship and '... and N more' beyond that (reference
    src/esco_cli.py:67-91)."""
    monkeypatch.setenv("NO_COLOR", "1")
    rc = main(
        ["search", "analyse data", "--limit", "1", "--node-type",
         "occupation", "--related"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Related entities for '" in out
    # at least one relationship section with a count
    import re

    m = re.search(r"^(\w[\w ]*) \((\d+)\):$", out, re.M)
    assert m, out
    # a section with >5 members must truncate with the exact phrase
    for name, cnt in re.findall(r"^([\w ]+) \((\d+)\):$", out, re.M):
        if int(cnt) > 5:
            assert f"... and {int(cnt) - 5} more" in out
            bullets = out.split(f"{name} ({cnt}):")[1].split("\n\n")[0]
            assert bullets.count("  • ") == 5


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


def test_print_related_nodes_truncates_at_five(capsys, monkeypatch):
    """Unit pin of the exact truncation rule: 5 bullets then
    '... and N more' (reference src/esco_cli.py:84-91)."""
    monkeypatch.setenv("NO_COLOR", "1")
    from esco_neo4j_spark.terminal import print_related_nodes

    print_related_nodes(
        {
            "node": {"label": "x", "uri": "u"},
            "related": {
                "essential_skills": [
                    {"label": f"s{i}"} for i in range(7)
                ],
                "optional_skills": [],
            },
        }
    )
    out = capsys.readouterr().out
    assert "Essential Skills (7):" in out
    assert out.count("  • ") == 5
    assert "... and 2 more" in out
    assert "Optional Skills" not in out  # empty sections are skipped
