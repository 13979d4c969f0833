"""The reference's POS simulator as a NATIVE Spark data source
(pos/pos_simulator.py:62-205 re-imagined on the PySpark 4 Python
DataSource API) — instead of an external process producing JSON into
Kafka, the generator IS a table/stream the engine reads:

    spark.dataSource.register(PosSimulatorDataSource)
    spark.read.format("pos_simulator").option("rows", 1000).load()
    spark.readStream.format("pos_simulator").option("rows_per_batch", 50)...

Rows are DETERMINISTIC given (seed, row index): every field derives
from a seeded per-row RNG, so tests (and any two executors planning
the same split) see identical data — the property the reference's
`random.choice` producer (pos_simulator.py:169-171, random delays at
:199-205) explicitly lacks. Schema and value shapes mirror the raw
transaction CSV contract (SURVEY.md §1.2): `Amount` keeps its `$x.xx`
string form, `Errors?`/`Is Fraud?` carry the reference's spellings,
and ~5.6%% fraud / ~3.2%% error rates match the sample corpus stats
(sample_data/README.md:44-53).

Scale: the batch reader splits `rows` across `partitions` independent
InputPartitions (each generates its slice locally — no driver
materialization, no shuffle); the stream reader is a
SimpleDataSourceStreamReader whose offset is simply the next row
index, so exactly-once replay after restart is a pure function of the
committed offset range.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from olap_project_spark.schemas import RAW_TRANSACTION_SCHEMA

_CITIES = [
    ("La Verne", "CA", "91750"),
    ("Monterey Park", "CA", "91754"),
    ("New York", "NY", "10001"),
    ("Houston", "TX", "77001"),
    ("Rome", "XX", ""),  # the sample's foreign-city marker state
]
_MERCHANTS = [
    "Apple Pay", "Uber", "Walgreens", "McDonald's", "Shell Oil",
    "Amazon.com", "Target", "Starbucks",
]
_USE_CHIP = ["Chip Transaction", "Online Transaction", "Swipe Transaction"]
_ERRORS = ["Bad CVV", "Bad Expiration", "Insufficient Balance", "Technical Glitch"]


def _row(seed: int, i: int) -> tuple:
    """Transaction #i — a pure function of (seed, i)."""
    rng = random.Random((seed << 32) ^ i)
    user = str(rng.randint(0, 9))
    # Each user holds TWO fixed 16-digit cards (the sample corpus shape:
    # one card string recurring across a user's transactions,
    # raw_transactions.csv:2-3) — recurrence is what makes the per-card
    # sequence analyses (Q5 rapid-transaction gaps) non-degenerate.
    card = str(4532015112830000 + int(user) * 10 + rng.randint(0, 1))
    year, month = 2024, 1
    day = 15 + rng.randint(0, 5)                     # the sample's 6-day span
    hh, mm, ss = rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59)
    time_s = f"{hh:02d}:{mm:02d}"
    amount = f"${rng.randint(999, 500000) / 100:.2f}"
    merchant = rng.choice(_MERCHANTS)
    city, state, zip_ = rng.choice(_CITIES)
    mcc = str(rng.choice([5411, 5541, 5812, 4121, 5912]))
    errors = rng.choice(_ERRORS) if rng.random() < 0.032 else ""
    fraud = "Yes" if rng.random() < 0.056 else "No"
    ts = f"{year}-{month:02d}-{day:02d}T{hh:02d}:{mm:02d}:{ss:02d}"
    return (
        user, card, year, month, day, time_s, amount,
        rng.choice(_USE_CHIP), merchant, city, state, zip_, mcc,
        errors, fraud, ts,
    )


class _Slice(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class PosBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 42))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n // self.n_parts))
        return [
            _Slice(self.seed, lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class PosStreamReader(SimpleDataSourceStreamReader):
    """Offset = next row index. ``rows_per_batch`` rows arrive per
    micro-batch up to ``rows`` total (a bounded replay — availableNow
    drains it exactly once; omit ``rows`` for an unbounded feed)."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.per_batch = int(options.get("rows_per_batch", 100))
        self.limit = int(options.get("rows", 0)) or None

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["i"]
        hi = lo + self.per_batch
        if self.limit is not None:
            hi = min(hi, self.limit)
        # list-iterator, not a generator: the engine's prefetch cache
        # copy.copy()s the iterator, which generators don't support
        return iter([_row(self.seed, i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Exactly-once replay after restart: regenerate the committed
        # range — possible precisely because rows are pure(seed, i).
        return iter([_row(self.seed, i) for i in range(start["i"], end["i"])])


class PosSimulatorDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pos_simulator"

    def schema(self) -> StructType:
        return RAW_TRANSACTION_SCHEMA

    def reader(self, schema) -> PosBatchReader:
        return PosBatchReader(self.options)

    def simpleStreamReader(self, schema) -> PosStreamReader:
        return PosStreamReader(self.options)
