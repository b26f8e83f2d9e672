"""SparkSession factory.

The reference builds a Bolt driver per CLI invocation
(reference: src/neo4j_client.py:101-107, config merge :30-80). Our equivalent
entry point is a SparkSession tuned for the target deployment. Local mode is
single-JVM; on a cluster the same settings (AQE, shuffle partitions sized to
the data, UTC timestamps) carry over.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Conf applied to any session we create AND defensively re-applied (runtime
# settable subset) to sessions handed to us by a driver harness.
_RUNTIME_CONF = {
    # Deterministic timestamp semantics; required for oracle comparison
    # (parquet stores UTC instants, DuckDB reads them naive-UTC).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing, skew-join splitting, dynamic join strategy.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas_udf / toPandas hot paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver's events.parquet stores TIMESTAMP(NANOS); Spark refuses
    # nanos unless read as long. catalog.load_table converts the long back
    # to a microsecond timestamp (ns floor-div 1000) — the same value the
    # DuckDB oracle sees after make_timestamp(epoch_ns(ts)//1000).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an existing session.

    Safe to call on a session we did not create (the verify driver's).
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in some envs
            pass
    try:
        # Size shuffles to the machine, not the 200 default. On a real
        # cluster this is overridden per-job (or left to AQE coalescing).
        spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    except Exception:  # pragma: no cover
        pass
    return spark


def conf_from_config(config: dict | None) -> dict[str, str]:
    """Map an engine config (config.load_config) onto Spark builder conf.

    Pure function so the profile->conf translation is unit-testable without
    constructing a session. Falsy config values fall back to the engine
    defaults (env vars / all-cores local master).
    """
    cfg = config or {}
    cpus = int(cfg.get("cpus") or default_parallelism())
    return {
        "spark.master": str(cfg.get("master") or f"local[{cpus}]"),
        "spark.sql.shuffle.partitions": str(
            cfg.get("shuffle_partitions") or cpus
        ),
        "spark.driver.memory": str(
            cfg.get("driver_memory")
            or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        ),
        "spark.driver.maxResultSize": str(cfg.get("max_result_size") or "4g"),
    }


def get_spark(
    app_name: str = "esco_neo4j_spark",
    master: str | None = None,
    config: dict | None = None,
) -> SparkSession:
    """Create (or get) the engine SparkSession.

    ``config`` is an engine config dict from ``config.load_config`` (YAML
    profile + env merge, A8); explicit ``master`` wins over it. Local
    mode: one JVM, N threads, driver memory is the only knob.
    """
    conf = conf_from_config(config)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or conf.pop("spark.master"))
        .config("spark.ui.enabled", "false")
    )
    conf.pop("spark.master", None)
    for k, v in conf.items():
        builder = builder.config(k, v)
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
