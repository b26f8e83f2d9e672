"""Single-pass write + data-quality metrics via the Observation API.

At 100 TB a pipeline cannot afford a second scan just to report "how many
rows / how many nulls / value range" after a write — `df.observe` attaches
aggregates to the SAME action that materializes the data, so the QA
counters come out of the write's single pass (executor-side accumulation,
no extra job, no cache). This is the engine-level form of the reference's
post-ingest count checks (src/esco_ingest.py:337-342 runs separate
verification queries; here verification rides the write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def write_parquet_with_metrics(
    df: DataFrame,
    path: str,
    metric_cols: list[str],
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as parquet and return QA metrics collected DURING the
    write: row count plus, per requested column, null count and min/max.

    Returns {"n_rows": ..., "<col>_nulls": ..., "<col>_min": ...,
    "<col>_max": ...}.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in metric_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    obs = Observation("write_qa")
    df.observe(obs, *aggs).write.mode(mode).parquet(path)
    return dict(obs.get)
