"""Task-retry resilience: SURVEY §4 maps the reference's client-side
retry loop (src/neo4j_client.py:136-149) to Spark task retry — this
pins that the mapping actually holds: a TRANSIENTLY-failing Arrow UDF
(fails once, then succeeds) completes with exactly-once results under
``spark.task.maxFailures`` > 1, with no duplicated or lost rows.

Runs in a subprocess because task retries need the ``local[N, F]``
master form, and the shared session fixture is ``local[N]`` (where any
task failure is fatal by design — fail fast in tests)."""
from __future__ import annotations

import os
import subprocess
import sys


def test_transient_udf_failure_is_retried_exactly_once(tmp_path):
    flag = str(tmp_path / "crashed_once")
    script = f"""
import os
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2,2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
FLAG = {flag!r}

def crash_once(batches):
    import os
    first = not os.path.exists(FLAG)
    if first:
        with open(FLAG, "w") as fh:
            fh.write("x")
    for pdf in batches:
        if first:
            raise RuntimeError("transient failure (simulated)")
        yield pdf

df = spark.range(1000).toDF("id").repartition(4)
total = (
    df.mapInPandas(crash_once, schema="id long")
    .agg({{"id": "sum"}}).collect()[0][0]
)
assert total == 499500, f"retry lost or duplicated rows: sum={{total}}"
assert os.path.exists(FLAG), "the failure branch never executed"
print("RESILIENCE_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "RESILIENCE_OK" in proc.stdout, proc.stderr[-2000:]
