"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`): a
deterministic synthetic-events generator.

The A-family's API frontier: where sources/esco.py wraps files, this is
a FROM-NOTHING source — `spark.read.format("synthetic_events")` — that
fabricates an events-shaped table of any size without materializing
bytes first. Used by scale smokes (generate 10m rows straight into the
scan) and as the reference implementation of the DataSource contract
(partition planning, per-partition iterators).

Determinism rules (the same discipline as every operator here):
- no RNG objects — every field is integer hash arithmetic on the row id,
  so row i is identical regardless of partition count or executor;
- partitions carry only their [start, end) slice, so `partitions()` is
  pure planning metadata and reads are embarrassingly parallel.

Both faces of the DataSource contract are implemented: the batch
reader (partition-sliced) and a SimpleDataSourceStreamReader whose
offsets are row counters into the same deterministic sequence — so
stream output is an exact prefix-identity of the batch scan, and any
committed offset window replays bit-identically after a restart.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
_BASE_US = 1_704_067_200_000_000  # 2024-01-01 UTC in epoch micros


def _mix(i: int, salt: int) -> int:
    """Deterministic 64-bit integer mix (splitmix64-style constants)."""
    x = (i * 0x9E3779B97F4A7C15 + salt * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    x ^= x >> 31
    x = (x * 0x94D049BB133111EB) & (2**64 - 1)
    return x ^ (x >> 29)


def _event_row(i: int, n_users: int):
    """Row i of the deterministic event universe — shared by the batch
    reader (slices of [0, n_rows)) and the stream reader (offset-delimited
    slices of the same sequence), which is what makes stream-vs-batch
    equality a testable identity."""
    import datetime

    ts_us = _BASE_US + _mix(i, 1) % (30 * 86_400_000_000)
    return (
        i,
        datetime.datetime.utcfromtimestamp(ts_us / 1_000_000),
        _mix(i, 2) % n_users,
        EVENT_TYPES[_mix(i, 3) % len(EVENT_TYPES)],
        round((_mix(i, 4) % 100_000) / 100.0, 2),
        '{"gen":"synthetic"}',
    )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_users = int(options.get("n_users", 100))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_partitions))
        return [
            InputPartition((lo, min(lo + step, self.n_rows)))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield _event_row(i, self.n_users)


class SyntheticEventsDataSource(DataSource):
    """`spark.read.format("synthetic_events").option("n_rows", N).load()`"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
                StructField("props", StringType()),
            ]
        )

    def reader(self, schema) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same deterministic event universe (closing
    the gap the module docstring used to disclaim): offsets are plain
    row counters into the _event_row sequence, so

    - ``read(start)`` emits the next ``rows_per_batch`` rows and advances
      the offset — pure arithmetic, no state beyond the offset itself;
    - ``readBetweenOffsets(start, end)`` regenerates EXACTLY the rows of
      any committed window, which is what gives checkpoint-restart replay
      (and therefore end-to-end exactly-once into an idempotent sink) for
      free: the source can always re-serve a window bit-identically;
    - the stream's first K*rows_per_batch rows equal the batch source's
      first rows — stream==batch is an identity, pinned in
      tests/test_pydatasource.py.
    """

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_users = int(options.get("n_users", 100))

    def initialOffset(self):
        return {"row": 0}

    def read(self, start):
        s = int(start["row"])
        e = s + self.rows_per_batch
        return iter([_event_row(i, self.n_users) for i in range(s, e)]), {
            "row": e
        }

    def readBetweenOffsets(self, start, end):
        return iter(
            [_event_row(i, self.n_users)
             for i in range(int(start["row"]), int(end["row"]))]
        )


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
