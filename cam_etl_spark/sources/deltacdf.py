"""Registered custom STREAMING source over a Delta CHANGE DATA FEED
(Python DataSourceStreamReader, Spark 4) — the streaming twin of
delta_log.read_changes and the retraction-aware sibling of
sources/deltatail.py: offsets are LOG VERSIONS (latestOffset is the
newest commit on disk — a pure function of durable state, so a
checkpoint restart can never regress and double-deliver), each
micro-batch carries the pending commits' CHANGE SETS (explicit cdc
files when a commit carries them — add/remove ignored per protocol
precedence — else derived: dataChange adds as inserts, dataChange
removes as deletes read from the still-on-disk parquet), and every
row carries _change_type and _commit_version. Unlike the tail source, deletes ARE delivered — as
retraction rows — which is what a downstream incremental maintainer
(aggregate view, index, dedup state) needs to stay consistent under
rewrites.

Scale shape: the driver replays only commit JSON (kilobytes per
version); each change fragment is one executor-side pyarrow
InputPartition. dataChange=false commits (compaction) contribute
NOTHING — the stream is provably silent across an OPTIMIZE.

Columns are projected via the required ``columns`` option; cdc
files' own _change_type column wins over the per-fragment label.
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

    class DeltaCdfDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "deltacdf"

        def schema(self):
            return self.options["schema"]

        def streamReader(self, schema):
            return _DeltaCdfReader(self.options)

    class _DeltaCdfReader(DataSourceStreamReader):
        def __init__(self, options):
            self.table = options["path"]
            self.columns = [
                c.strip() for c in options["columns"].split(",")
            ]

        def _log_versions(self):
            log_dir = os.path.join(self.table, "_delta_log")
            return sorted(
                int(n[:20])
                for n in os.listdir(log_dir)
                if n.endswith(".json") and n[:20].isdigit()
            )

        def initialOffset(self):
            # UNLIKE deltatail (an append-only view where starting at
            # the earliest available commit is the standard ingest
            # policy), a CHANGE FEED that silently skips truncated
            # history would hand a downstream incremental maintainer
            # a permanently wrong base — reject instead
            versions = self._log_versions()
            if versions and versions[0] != 0:
                raise ValueError(
                    f"deltacdf: change history truncated — earliest "
                    f"commit on disk is {versions[0]}, not 0; a CDF "
                    "stream needs complete history (bootstrap the "
                    "downstream state from a snapshot instead)"
                )
            return {"version": -1}

        def latestOffset(self):
            # newest commit on disk — a pure function of durable log
            # state (an in-memory cursor regresses on checkpoint
            # restart and double-delivers; see deltatail.latestOffset)
            versions = self._log_versions()
            return {"version": versions[-1] if versions else -1}

        def partitions(self, start, end):
            s, e = int(start["version"]), int(end["version"])
            log_dir = os.path.join(self.table, "_delta_log")
            parts = []
            for v in range(s + 1, e + 1):
                vpath = os.path.join(log_dir, f"{v:020d}.json")
                if not os.path.exists(vpath):
                    raise ValueError(
                        f"deltacdf: log gap — commit {v} missing from "
                        f"{log_dir} (removed by log retention?); "
                        "restart the stream from a fresh checkpoint"
                    )
                with open(vpath, encoding="utf-8") as fh:
                    actions = [
                        json.loads(line) for line in fh if line.strip()
                    ]
                cdc = [a["cdc"] for a in actions if "cdc" in a]
                frags = []

                def _pv(action_body):
                    return tuple(
                        sorted(
                            (
                                action_body.get("partitionValues") or {}
                            ).items()
                        )
                    )

                if cdc:
                    # protocol precedence: cdc actions ARE the change
                    # set; add/remove are ignored for CDF
                    frags = [(c["path"], None, _pv(c)) for c in cdc]
                else:
                    for a in actions:
                        if "add" in a and a["add"].get("dataChange"):
                            frags.append(
                                (a["add"]["path"], "insert", _pv(a["add"]))
                            )
                        elif "remove" in a and a["remove"].get(
                            "dataChange", True
                        ):
                            frags.append(
                                (
                                    a["remove"]["path"],
                                    "delete",
                                    _pv(a["remove"]),
                                )
                            )
                for path, label, pvals in frags:
                    parts.append(
                        InputPartition(
                            (
                                os.path.join(self.table, path),
                                label,
                                v,
                                pvals,
                            )
                        )
                    )
            if not parts:
                parts.append(InputPartition((None, None, -1, ())))
            return parts

        def read(self, partition):
            path, label, version, pvals = partition.value
            if path is None:
                return
            import pyarrow.parquet as pq

            # partition columns live in the log's partitionValues, not
            # in the parquet (same injection as deltatail.read)
            pmap = dict(pvals)
            file_cols = [
                c
                for c in self.columns
                if c not in pmap and c != "_commit_version"
                and not (c == "_change_type" and label is not None)
            ]
            # remove.partitionValues is OPTIONAL in the Delta protocol;
            # a writer that omits it would let requested partition
            # columns fall through to file_cols and fail inside
            # pq.read_table with an opaque missing-column error — name
            # the boundary loudly instead
            present = set(pq.read_schema(path).names)
            if label is None and "_change_type" in file_cols \
                    and "_change_type" not in present:
                raise ValueError(
                    "deltacdf: cdc file missing _change_type column"
                )
            absent = [
                c for c in file_cols
                if c not in present and c != "_change_type"
            ]
            if absent:
                raise ValueError(
                    "deltacdf: columns "
                    f"{absent} are neither in the data file nor in the "
                    "action's partitionValues (the writer omitted "
                    f"remove.partitionValues?) for {path}"
                )
            table = pq.read_table(path, columns=file_cols or None)
            data = table.to_pydict()
            for i in range(table.num_rows):
                row = []
                for c in self.columns:
                    if c == "_commit_version":
                        row.append(version)
                    elif c == "_change_type":
                        row.append(
                            label
                            if label is not None
                            else data["_change_type"][i]
                        )
                    elif c in pmap:
                        row.append(pmap[c])
                    else:
                        row.append(data[c][i])
                yield tuple(row)

        def commit(self, end):
            # offsets derive from the log; Spark's checkpoint owns
            # the committed cursor
            pass

    def register_delta_cdf(spark: SparkSession) -> None:
        """Idempotent registration of the 'deltacdf' format."""
        spark.dataSource.register(DeltaCdfDataSource)

except ImportError:  # pragma: no cover - Spark < 4
    DeltaCdfDataSource = None  # type: ignore[assignment]

    def register_delta_cdf(spark: SparkSession) -> None:
        raise NotImplementedError(
            "deltacdf requires Spark >= 4 (pyspark.sql.datasource)"
        )
