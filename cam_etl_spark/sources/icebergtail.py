"""Registered custom STREAMING source over an Iceberg metadata chain
(Python DataSourceStreamReader, Spark 4) — the Iceberg twin of
sources/deltatail.py: a stream whose offsets are POSITIONS IN THE
SNAPSHOT CHAIN, whose batches are the data files each snapshot ADDED
relative to its parent (the same set-diff as
iceberg_meta.incremental_files), and whose rows are read
executor-side from those parquet files.

``spark.readStream.format("icebergtail").option("path", table)``
walks the parent-pointer chain root -> current snapshot:
`initialOffset` = position -1, `latestOffset` = the chain's current
end (a PURE FUNCTION of durable table metadata — an in-memory
per-batch cursor resets on checkpoint restart, regresses the offset,
and double-delivers; snapshots committed while the stream runs still
form separate micro-batches), `partitions(start, end)` diffs
consecutive snapshots' file sets DRIVER-side (kilobytes of Avro
manifests — never the data) and emits one InputPartition per added
file with its manifest partition values, and `read(partition)`
materializes rows EXECUTOR-side via pyarrow. File DELETIONS between snapshots are
ignored by design — a tail is an APPEND-ONLY view of the table
(change-feed ingest semantics); snapshot-consistent reads are
iceberg_meta.read_snapshot.

At 100 TB this is the streaming lake-ingest shape: the driver holds
a snapshot cursor, each new snapshot fans its added files out as
input partitions, and no data-directory listing ever happens.

Columns are projected via the required ``columns`` option; manifest
partition values are injected for columns the data files do not
carry (hive-partitioned writes drop them from the parquet).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class IcebergTailDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "icebergtail"

        def schema(self):
            return self.options["schema"]

        def streamReader(self, schema):
            return _IcebergTailReader(self.options)

    class _IcebergTailReader(DataSourceStreamReader):
        def __init__(self, options):
            self.table = options["path"]
            self.columns = [
                c.strip() for c in options["columns"].split(",")
            ]

        def _chain(self):
            """Snapshot ids root -> current via parent pointers."""
            from cam_etl_spark.sources.iceberg_meta import (
                load_table_metadata,
            )

            meta = load_table_metadata(self.table)
            snaps = {
                s["snapshot-id"]: s for s in meta.get("snapshots", [])
            }
            cur = meta.get("current-snapshot-id")
            chain = []
            while cur is not None:
                chain.append(cur)
                cur = snaps[cur].get("parent-snapshot-id")
            return list(reversed(chain))

        def initialOffset(self):
            return {"pos": -1, "snap": None}

        def latestOffset(self):
            # current end of the snapshot chain — a pure function of
            # durable table metadata (an in-memory cursor regresses on
            # checkpoint restart and double-delivers; see
            # deltatail.latestOffset). The offset also CARRIES the
            # snapshot id at that position: positions silently REMAP
            # when snapshots expire, so partitions() must be able to
            # detect a changed chain instead of skipping or
            # re-delivering data.
            chain = self._chain()
            return {
                "pos": len(chain) - 1,
                "snap": chain[-1] if chain else None,
            }

        def partitions(self, start, end):
            from cam_etl_spark.sources.iceberg_meta import (
                snapshot_files,
            )

            s, e = int(start["pos"]), int(end["pos"])
            chain = self._chain()
            for off in (start, end):
                p, sid = int(off["pos"]), off.get("snap")
                if p < 0 or sid is None:
                    continue
                if p >= len(chain) or chain[p] != sid:
                    raise ValueError(
                        f"icebergtail: snapshot chain changed under "
                        f"the checkpoint — offset pos {p} recorded "
                        f"snapshot {sid}, chain now has "
                        f"{chain[p] if p < len(chain) else 'nothing'} "
                        "there (expired snapshots?); restart the "
                        "stream from a fresh checkpoint"
                    )
            parts = []
            before: set | None = None
            for pos in range(s + 1, e + 1):
                snap = snapshot_files(self.table, chain[pos])
                if before is None:
                    before = (
                        {
                            f["path"]
                            for f in snapshot_files(
                                self.table, chain[pos - 1]
                            )["files"]
                        }
                        if pos
                        else set()
                    )
                for f in snap["files"]:
                    if f["path"] in before:
                        continue
                    parts.append(
                        InputPartition(
                            (
                                f["path"],
                                tuple(sorted(f["partition"].items())),
                            )
                        )
                    )
                # carry this snapshot's file set into the next diff:
                # one manifest parse per snapshot, not two
                before = {f["path"] for f in snap["files"]}
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
            for i in range(table.num_rows):
                yield tuple(
                    pmap[c] if c in pmap else data[c][i]
                    for c in self.columns
                )

        def commit(self, end):
            # offsets derive from table metadata; Spark's checkpoint
            # owns the committed cursor
            pass

    def register_iceberg_tail(spark: SparkSession) -> None:
        """Idempotent registration of the 'icebergtail' format."""
        spark.dataSource.register(IcebergTailDataSource)

except ImportError:  # pragma: no cover - Spark < 4
    IcebergTailDataSource = None  # type: ignore[assignment]

    def register_iceberg_tail(spark: SparkSession) -> None:
        raise NotImplementedError(
            "icebergtail requires Spark >= 4 (pyspark.sql.datasource)"
        )
