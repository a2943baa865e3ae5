"""Registered custom BATCH sink (Python DataSourceWriter, Spark 4) — the
write-side twin of the registered shapefile/counterstream READERS
(sources/shapefile.py, sources/counterstream.py): connector
extensibility without JVM code, now covering the full writer commit
protocol.

``quads.write.format("nquads_sink").mode("overwrite").save(path)``
serializes quad rows to N-Quads part files with the real two-phase
lifecycle a production sink needs:

* ``write(iterator)`` runs EXECUTOR-side, one call per partition, and
  streams its rows into a ``_tmp-*`` staging file — nothing becomes
  visible mid-job;
* ``commit(messages)`` runs DRIVER-side only after every task
  succeeded, atomically renames staging files to ``part-NNNNN.nq``,
  and writes a ``_MANIFEST.json`` (file list + total quad count) that
  readers can use for consistency checks;
* ``abort(messages)`` removes staging files so a failed job leaves no
  partial output.

Serialization matches cam_etl_spark/quads.py byte-for-byte (same
N-Triples escaping table: backslash first, then quote/newline/CR/tab;
IRI vs bnode vs typed/tagged literal terms), so ``read_nquads`` round-
trips everything this sink writes — proven by the
``s15_nquads_datasource_sink`` catalog query whose literals include
quotes, backslashes, newlines and tabs.

Local-mode note (same caveat as the reference's one-file-per-job sink,
SURVEY S7): staging and final files share one directory because driver
and executors share a filesystem here; on HDFS/object storage the same
protocol stages under per-task-attempt paths and ``commit`` performs
the rename/manifest step against the shared store — the lifecycle
shape is identical.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    @dataclass
    class _PartFile(WriterCommitMessage):
        path: str
        n_rows: int

    class NQuadsSinkDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "nquads_sink"

        def writer(self, schema, overwrite: bool):
            return _NQuadsWriter(dict(self.options), overwrite)

    class _NQuadsWriter(DataSourceWriter):
        def __init__(self, options: dict, overwrite: bool):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("nquads_sink: a save path is required")
            self.overwrite = overwrite

        # -- executor side ------------------------------------------------
        def write(self, iterator):
            os.makedirs(self.path, exist_ok=True)
            tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.nq")
            n = 0
            with open(tmp, "w", encoding="utf-8") as f:
                for row in iterator:
                    f.write(serialize_quad(row))
                    f.write("\n")
                    n += 1
            return _PartFile(path=tmp, n_rows=n)

        # -- driver side --------------------------------------------------
        def commit(self, messages):
            if self.overwrite:
                for name in os.listdir(self.path):
                    if name.startswith("part-") or name == "_MANIFEST.json":
                        os.remove(os.path.join(self.path, name))
            files, total = [], 0
            for i, m in enumerate(messages):
                final = os.path.join(self.path, f"part-{i:05d}.nq")
                os.replace(m.path, final)
                files.append(os.path.basename(final))
                total += m.n_rows
            with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
                json.dump({"files": files, "n_quads": total}, f)

        def abort(self, messages):
            for m in messages or []:
                try:
                    os.remove(m.path)
                except (OSError, AttributeError):
                    pass

    _AVAILABLE = True
except ImportError:  # pragma: no cover - pyspark < 4
    _AVAILABLE = False


def _escape(s: str) -> str:
    """The quads.py N-Triples escaping table, Python-side (order matters:
    backslash FIRST so later escapes are not double-escaped)."""
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def serialize_quad(row) -> str:
    """One quad row -> one N-Quads line, byte-identical to
    quads.to_nquads_lines for the same row."""
    subj = row.subject if row.subject.startswith("_:") else f"<{row.subject}>"
    if row.object_kind == "iri":
        term = f"<{row.object_value}>"
    elif row.object_kind == "bnode":
        term = f"_:{row.object_value}"
    else:
        term = f'"{_escape(row.object_value)}"'
        if row.object_lang is not None:
            term += f"@{row.object_lang}"
        elif row.object_datatype is not None:
            term += f"^^<{row.object_datatype}>"
    return f"{subj} <{row.predicate}> {term} <{row.graph}> ."


def register_nquads_sink(spark: SparkSession) -> bool:
    """Register the sink format; idempotent. Returns availability."""
    if not _AVAILABLE:
        return False
    spark.dataSource.register(NQuadsSinkDataSource)
    return True
