"""A8 config source tests: YAML profiles + env override merge
(reference semantics: src/neo4j_client.py:30-80), and the pure
profile -> Spark-conf mapping."""

from __future__ import annotations

import pytest

from esco_neo4j_spark.config import load_config
from esco_neo4j_spark.session import conf_from_config


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    """Env isolation: the session spark fixture (and CLI tests) export
    SPARK_GRAFT_* vars; these tests assert file-vs-env precedence and must
    start from a clean slate."""
    from esco_neo4j_spark.config import ENV_MAPPING

    for var in [*ENV_MAPPING, "SPARK_GRAFT_PROFILE"]:
        monkeypatch.delenv(var, raising=False)


@pytest.fixture()
def cfg_file(tmp_path):
    p = tmp_path / "engine.yaml"
    p.write_text(
        "default:\n"
        "  cpus: 4\n"
        "  shuffle_partitions: 7\n"
        "  driver_memory: '8g'\n"
        "cluster:\n"
        "  master: 'yarn'\n"
        "  shuffle_partitions: 2048\n"
        "sf_dir: '/data/sf1'\n"
    )
    return str(p)


def test_default_profile_merge(cfg_file):
    cfg = load_config(cfg_file)
    assert cfg["cpus"] == 4
    assert cfg["shuffle_partitions"] == 7
    assert cfg["sf_dir"] == "/data/sf1"  # root-level scalar survives
    assert cfg["profile"] == "default"


def test_named_profile_overrides_default(cfg_file):
    cfg = load_config(cfg_file, profile="cluster")
    assert cfg["master"] == "yarn"
    assert cfg["shuffle_partitions"] == 2048
    assert cfg["sf_dir"] == "/data/sf1"


def test_unknown_profile_falls_back_to_default(cfg_file):
    # reference: config.get(profile, config['default'])
    cfg = load_config(cfg_file, profile="nope")
    assert cfg["shuffle_partitions"] == 7


def test_env_overrides_file(cfg_file, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "13")
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "64g")
    cfg = load_config(cfg_file)
    assert cfg["shuffle_partitions"] == 13
    assert cfg["driver_memory"] == "64g"


def test_invalid_numeric_env_skipped_with_warning(cfg_file, monkeypatch, caplog):
    # reference :58-68: invalid numeric env values warn and keep the file
    # value instead of crashing
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "not_a_number")
    with caplog.at_level("WARNING"):
        cfg = load_config(cfg_file)
    assert cfg["shuffle_partitions"] == 7
    assert any("Invalid numeric" in r.message for r in caplog.records)


def test_non_integer_file_value_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("default:\n  cpus: 'abc'\n")
    with pytest.raises(ValueError, match="must be an integer"):
        load_config(str(p))


def test_missing_file_is_env_only(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "3")
    cfg = load_config(None)
    assert cfg["cpus"] == 3


def test_profile_env_selects(cfg_file, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PROFILE", "cluster")
    cfg = load_config(cfg_file)
    assert cfg["profile"] == "cluster" and cfg["master"] == "yarn"


def test_conf_from_config_mapping():
    conf = conf_from_config(
        {
            "master": "yarn",
            "cpus": 4,
            "shuffle_partitions": 2048,
            "driver_memory": "16g",
            "max_result_size": "8g",
        }
    )
    assert conf["spark.master"] == "yarn"
    assert conf["spark.sql.shuffle.partitions"] == "2048"
    assert conf["spark.driver.memory"] == "16g"
    assert conf["spark.driver.maxResultSize"] == "8g"


def test_conf_from_config_falsy_defaults(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "6")
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    conf = conf_from_config({"master": "", "cpus": 0, "shuffle_partitions": 0})
    assert conf["spark.master"] == "local[6]"
    assert conf["spark.sql.shuffle.partitions"] == "6"


def test_log_sink_writes_file(tmp_path):
    # A11: console + file handler (reference src/logging_config.py:4-30)
    from esco_neo4j_spark.logging_config import setup_logging

    logger = setup_logging("INFO", str(tmp_path / "logs"))
    logger.info("hello sink")
    text = (tmp_path / "logs" / "esco.log").read_text()
    assert "hello sink" in text and "INFO" in text
