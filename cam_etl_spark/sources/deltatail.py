"""Registered custom STREAMING source over a Delta transaction log
(Python DataSourceStreamReader, Spark 4) — the incremental-ingest
("auto-loader") shape: a stream whose offsets are LOG VERSIONS, whose
batches are the files ADDED by each commit, and whose rows are read
executor-side from those parquet files.

``spark.readStream.format("deltatail").option("path", table)`` tails
`_delta_log/`: `initialOffset` = one before the earliest available
commit, `latestOffset` = the newest commit on disk (offsets are a
PURE FUNCTION of durable log state — an in-memory per-batch cursor
resets on checkpoint restart, regresses the offset, and
double-delivers the last commit; commits arriving while the stream
runs still form separate micro-batches), `partitions(start, end)`
replays the JSON commits in (start, end] DRIVER-side (kilobytes —
never the data) and emits one InputPartition per added file, and
`read(partition)` materializes the file's rows EXECUTOR-side via
pyarrow. Remove
actions are ignored by design: a tail is an APPEND-ONLY view of the
log (the semantics of every change-feed ingest); snapshot-consistent
reads are sources/delta_log.read_snapshot.

At 100 TB this is exactly how streaming lake ingestion scales: the
driver tracks a version counter, each new commit fans its files out
as input partitions, and no listing of data directories ever happens.

Columns are projected via the required ``columns`` option (a
comma-separated list) so the executor-side reader prunes to the
needed subset.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class DeltaTailDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "deltatail"

        def schema(self):
            return self.options["schema"]

        def streamReader(self, schema):
            return _DeltaTailReader(self.options)

    class _DeltaTailReader(DataSourceStreamReader):
        def __init__(self, options):
            self.table = options["path"]
            self.columns = [
                c.strip() for c in options["columns"].split(",")
            ]

        def _log_versions(self):
            log_dir = os.path.join(self.table, "_delta_log")
            out = []
            for name in os.listdir(log_dir):
                if name.endswith(".json") and name[:20].isdigit():
                    out.append(int(name[:20]))
            return sorted(out)

        def initialOffset(self):
            # a retention-truncated log (early JSON commits removed after
            # checkpointing) starts past 0: seed at the earliest AVAILABLE
            # commit instead of crashing on missing version files
            versions = self._log_versions()
            return {"version": (versions[0] - 1) if versions else -1}

        def latestOffset(self):
            # the NEWEST commit on disk — derived ONLY from durable log
            # state. An in-memory "one commit per batch" cursor here
            # resets on a checkpoint restart, regresses the offset below
            # Spark's committed offset, re-baselines the engine, and
            # DOUBLE-DELIVERS the last commit (observed empirically);
            # offsets must be a pure function of durable state.
            versions = self._log_versions()
            return {"version": versions[-1] if versions else -1}

        def partitions(self, start, end):
            s, e = int(start["version"]), int(end["version"])
            parts = []
            log_dir = os.path.join(self.table, "_delta_log")
            for v in range(s + 1, e + 1):
                path = os.path.join(log_dir, f"{v:020d}.json")
                if not os.path.exists(path):
                    # a MID-RANGE missing commit means the log was
                    # truncated under a live checkpoint — silently
                    # skipping would drop data; mirror replay_log's
                    # loud log-gap rejection
                    raise ValueError(
                        f"deltatail: log gap — commit {v} missing from "
                        f"{log_dir} (removed by log retention?); restart "
                        "the stream from a fresh checkpoint"
                    )
                with open(path, encoding="utf-8") as fh:
                    for line in fh:
                        if not line.strip():
                            continue
                        action = json.loads(line)
                        if "add" in action:
                            parts.append(
                                InputPartition(
                                    (
                                        os.path.join(
                                            self.table,
                                            action["add"]["path"],
                                        ),
                                        tuple(
                                            sorted(
                                                (
                                                    action["add"].get(
                                                        "partitionValues"
                                                    )
                                                    or {}
                                                ).items()
                                            )
                                        ),
                                    )
                                )
                            )
            if not parts:
                parts.append(InputPartition((None, ())))
            return parts

        def read(self, partition):
            path, pvals = partition.value
            if path is None:
                return
            import pyarrow.parquet as pq

            pmap = dict(pvals)
            file_cols = [c for c in self.columns if c not in pmap]
            table = pq.read_table(path, columns=file_cols)
            data = table.to_pydict()
            n = table.num_rows
            for i in range(n):
                yield tuple(
                    pmap[c] if c in pmap else data[c][i]
                    for c in self.columns
                )

        def commit(self, end):
            # nothing to persist: offsets derive from the log itself,
            # and Spark's checkpoint owns the committed cursor
            pass

    def register_delta_tail(spark: SparkSession) -> None:
        """Idempotent registration of the 'deltatail' format."""
        spark.dataSource.register(DeltaTailDataSource)

except ImportError:  # pragma: no cover - Spark < 4
    DeltaTailDataSource = None  # type: ignore[assignment]

    def register_delta_tail(spark: SparkSession) -> None:
        raise NotImplementedError(
            "deltatail requires Spark >= 4 (pyspark.sql.datasource)"
        )
