"""Streaming sinks beyond the built-ins (SURVEY §2.10 extension).

``upsert_parquet_sink`` — merge-by-key streaming output via foreachBatch:
each micro-batch is merged with the current snapshot (latest row per key by
a sequence column wins) and written as a NEW versioned snapshot directory;
a pointer file is updated last, so readers always see a complete snapshot
(write-new-then-swap, never overwrite-in-place). On a lakehouse this is
Delta/Iceberg MERGE; the snapshot pattern here keeps the engine
dependency-free while preserving the exactly-once-per-batch semantics
(foreachBatch may retry a batch — the merge is idempotent because the same
(key, seq) pair always wins the same way).

``upsert_jdbc_sink`` — the same latest-per-key contract against a LIVE
database: stage each micro-batch through Spark's parallel JDBC writers,
then apply ONE server-side MERGE (tested end-to-end against embedded
Derby, whose driver ships in Spark's jars).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _current_snapshot(spark: SparkSession, base: str) -> DataFrame | None:
    ptr = os.path.join(base, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        path = f.read().strip()
    return spark.read.parquet(path)


def read_upsert_snapshot(spark: SparkSession, base: str) -> DataFrame:
    """The reader side: the latest complete snapshot."""
    snap = _current_snapshot(spark, base)
    if snap is None:
        raise FileNotFoundError(f"no snapshot yet under {base}")
    return snap


def upsert_parquet_sink(
    stream_df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    base_path: str,
    checkpoint: str,
):
    """Start a foreachBatch query that upserts each micro-batch into a
    versioned snapshot (latest ``seq_col`` per ``key_cols`` wins; ties
    break deterministically on the remaining columns)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import uuid

        spark = batch_df.sparkSession
        current = _current_snapshot(spark, base_path)
        merged = batch_df if current is None else current.unionByName(batch_df)
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), *[F.col(c).desc() for c in merged.columns]
        )
        latest = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # Unique directory PER ATTEMPT, not per batch: if foreachBatch
        # retries batch N after the pointer swap but before the checkpoint
        # commit, a per-batch path would make the retry overwrite the very
        # snapshot it is reading (Spark refuses / corrupts). A fresh dir per
        # attempt keeps every write target disjoint from every read source;
        # the retry merge is still idempotent ((key, seq) wins identically),
        # the pointer swap is still atomic. Orphan attempt dirs are garbage,
        # collectable by any janitor that spares the _CURRENT target.
        snap_dir = os.path.join(
            base_path, f"snapshot-{batch_id}-{uuid.uuid4().hex[:12]}"
        )
        latest.write.mode("error").parquet(snap_dir)
        os.makedirs(base_path, exist_ok=True)
        tmp = os.path.join(base_path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(snap_dir)
        os.replace(tmp, os.path.join(base_path, "_CURRENT"))

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def upsert_jdbc_sink(
    stream_df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    url: str,
    table: str,
    checkpoint: str,
    driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
    column_types: str | None = None,
):
    """Streaming upsert into a LIVE database via the stage-and-MERGE
    pattern — the scale-correct JDBC sink shape (the reference's actual
    sink is a database):

    1. each micro-batch reduces to latest-per-key (seq_col wins, ties
       break on the remaining columns descending — same contract as
       upsert_parquet_sink),
    2. the reduced batch lands in a staging table through Spark's
       parallel JDBC writers (set-based, partitioned, no driver-side row
       loop),
    3. ONE server-side ``MERGE INTO target USING staging`` statement
       applies it — the database does the keyed work; the Spark driver
       only issues the statement.

    Retry-idempotent: foreachBatch may replay a batch; the MERGE's
    ``staging.seq >= target.seq`` guard makes the replay a no-op for rows
    the first attempt already applied. Identifiers are expected
    UPPER-CASE (Derby folds unquoted SQL upper; Spark's sink quotes
    names); pass ``column_types`` to pin VARCHAR over Derby's CLOB
    default for string columns that the MERGE compares."""

    cols = stream_df.columns
    staging = f"{table}_STAGE"

    def _exec(spark, sql: str, *, swallow: str | None = None) -> None:
        jvm = spark.sparkContext._jvm
        conn = jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                st.execute(sql)
            finally:
                st.close()
        except Exception as e:
            if swallow is None or swallow not in str(e):
                raise
        finally:
            conn.close()

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(seq_col).desc(), *[F.col(c).desc() for c in batch_df.columns]
        )
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        writer = (
            latest.write.format("jdbc")
            .option("url", url)
            .option("dbtable", staging)
            .option("driver", driver)
            .mode("overwrite")
        )
        if column_types:
            writer = writer.option("createTableColumnTypes", column_types)
        writer.save()
        # target table: same shape as staging, created on first batch
        # (Derby has no IF NOT EXISTS — swallow the already-exists error)
        _exec(
            spark,
            f"CREATE TABLE {table} AS SELECT * FROM {staging} WITH NO DATA",
            swallow="already exists",
        )
        on = " AND ".join(f'T."{c}" = S."{c}"' for c in key_cols)
        sets = ", ".join(
            f'"{c}" = S."{c}"' for c in cols if c not in key_cols
        )
        ins_cols = ", ".join(f'"{c}"' for c in cols)
        ins_vals = ", ".join(f'S."{c}"' for c in cols)
        _exec(
            spark,
            f'MERGE INTO {table} T USING {staging} S ON {on} '
            f'WHEN MATCHED AND S."{seq_col}" >= T."{seq_col}" '
            f"THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})",
        )

    return (
        stream_df.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
