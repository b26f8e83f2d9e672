"""Z-order layout: correctness (a layout must never change results) and
the locality property it exists for — a 2-D predicate box touches fewer
files than under a 1-D sort."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from esco_neo4j_spark.sources.zorder import write_zordered, z_value

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(spark):
    # 200k rows with two INDEPENDENT uniform 8-bit dimensions (the sf
    # fixtures are too small to expose file-level locality): x = low id
    # bits, y = a multiplicative hash of the id
    return spark.range(0, 200_000, 1, 8).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 256).alias("ub"),
        ((F.col("id") * 2654435761) % 256).alias("cb"),
    )


def _files_touched(df) -> int:
    return (
        df.select(F.input_file_name().alias("f")).distinct().count()
    )


def test_zvalue_is_bit_interleave(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], ["x", "y"]
    ).select("x", "y", z_value(F.col("x"), F.col("y")).alias("z"))
    got = {(r["x"], r["y"]): r["z"] for r in rows.collect()}

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == morton(x, y)


def test_zorder_layout_preserves_data_and_improves_locality(spark, tmp_path):
    ev = _rows(spark)
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    # 1-D baseline: range-partitioned + sorted on ub alone (the best a
    # single-column sort can do), same file count
    (
        ev.repartitionByRange(16, "ub")
        .sortWithinPartitions("ub")
        .write.parquet(linear)
    )
    write_zordered(ev, zord, "ub", "cb", n_files=16)

    a = spark.read.parquet(linear)
    b = spark.read.parquet(zord)
    # layout never changes results
    assert a.count() == b.count() == 200_000
    assert (
        a.agg(F.sum("event_id"), F.sum("cb")).collect()
        == b.agg(F.sum("event_id"), F.sum("cb")).collect()
    )

    # The tradeoff z-order buys: a predicate on the SECOND dimension
    # alone. The ub-sorted layout scatters cb uniformly over every file
    # (all 16 touched); the Morton curve keeps a cb strip inside the
    # curve segments whose high y-bits match (~quarter of the files).
    strip = "cb BETWEEN 0 AND 31"
    touched_linear = _files_touched(a.filter(strip))
    touched_z = _files_touched(b.filter(strip))
    assert touched_linear == 16, "1-D sort cannot localize the other dim"
    assert touched_z <= touched_linear // 2, (
        f"z-order should localize the strip: {touched_z} vs {touched_linear}"
    )

    # and it still helps the leading dim enough that a 2-D box beats the
    # strip's footprint (locality on BOTH dims at once)
    box = "ub BETWEEN 64 AND 95 AND cb BETWEEN 0 AND 31"
    assert _files_touched(b.filter(box)) <= touched_z
