"""Registered custom STREAMING source (Python DataSourceStreamReader,
Spark 4) — the bespoke-feed connector shape a 100 TB pipeline needs when
the upstream isn't file- or Kafka-shaped (change feeds, paginated APIs,
replay services).

``spark.readStream.format("counterstream")`` emits a deterministic
integer sequence 0..max_rows as micro-batches of rows_per_batch: offsets
are plain row counters (JSON dicts), `partitions(start, end)` splits each
batch's range across executors, and `read(partition)` materializes rows
EXECUTOR-side — the full offset/partition/commit lifecycle of a real
connector with none of the environment dependencies, which is what makes
the catalog query's run-to-completion result SQL-oracle-checkable
(exactly-once: every n appears once regardless of batch boundaries,
restarts, or partition splits).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class CounterStreamDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "counterstream"

        def schema(self):
            return "n long"

        def streamReader(self, schema):
            return _CounterStreamReader(self.options)

    class _CounterStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self.max_rows = int(options.get("max_rows", "1000"))
            self.rows_per_batch = int(options.get("rows_per_batch", "100"))
            self.num_partitions = int(options.get("num_partitions", "4"))
            self.cur = 0

        def initialOffset(self):
            return {"n": 0}

        def latestOffset(self):
            self.cur = min(self.cur + self.rows_per_batch, self.max_rows)
            return {"n": self.cur}

        def partitions(self, start, end):
            s, e = int(start["n"]), int(end["n"])
            if e <= s:
                return [InputPartition((s, s))]
            n = max(1, min(self.num_partitions, e - s))
            step = -(-(e - s) // n)
            return [
                InputPartition((lo, min(lo + step, e)))
                for lo in range(s, e, step)
            ]

        def read(self, partition):
            lo, hi = partition.value
            for i in range(lo, hi):
                yield (i,)

        def commit(self, end):
            pass

    def register_counter_stream(spark: SparkSession) -> None:
        """Idempotent registration of the 'counterstream' format."""
        spark.dataSource.register(CounterStreamDataSource)

except ImportError:  # pragma: no cover - Spark < 4
    CounterStreamDataSource = None  # type: ignore[assignment]

    def register_counter_stream(spark: SparkSession) -> None:
        raise NotImplementedError(
            "counterstream requires Spark >= 4 (pyspark.sql.datasource)"
        )
