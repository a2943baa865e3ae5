"""Restart-replay tests for the three streaming lake tail sources
(sources/deltatail.py, deltacdf.py, icebergtail.py) — the protocol
edge the catalog entries don't exercise: exactly-once delivery across
a checkpoint reload. Round-9 review asked for these; writing them
exposed a REAL double-delivery bug (an in-memory latestOffset cursor
reset on restart, regressed the offset below Spark's committed one,
and re-delivered the last commit), fixed by deriving offsets purely
from durable log/metadata state.

Most tests drive the DataSourceStreamReader protocol directly
(initialOffset -> latestOffset -> partitions -> read -> commit), the
exact call sequence Spark's microbatch engine makes; a restart is a
FRESH reader instance resuming from the recorded committed offset —
which is precisely what the engine reconstructs from its checkpoint.
One test does a full Structured Streaming stop/restart against a real
checkpoint directory to pin the engine-level behavior end-to-end."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytest.importorskip("pyspark.sql.datasource")

from cam_etl_spark.sources import iceberg_meta as I
from cam_etl_spark.sources.delta_log import write_commit
from cam_etl_spark.sources.deltacdf import _DeltaCdfReader
from cam_etl_spark.sources.deltatail import _DeltaTailReader
from cam_etl_spark.sources.icebergtail import _IcebergTailReader


def _write_pq(path, ks, extra_cols=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cols = {"k": pa.array(ks, pa.int64())}
    for name, vals in (extra_cols or {}).items():
        cols[name] = vals
    pq.write_table(pa.table(cols), path)


def _delta_commit(table, version, rel, ks, data_change=True,
                  partition_values=None, write_file=True, remove=None):
    actions = []
    if remove:
        actions.append({"remove": {
            "path": remove, "deletionTimestamp": 0,
            "dataChange": data_change,
            "partitionValues": partition_values or {},
        }})
    if rel is not None:
        p = os.path.join(table, rel)
        if write_file:
            _write_pq(p, ks)
        actions.append({"add": {
            "path": rel, "partitionValues": partition_values or {},
            "size": os.path.getsize(p), "modificationTime": 0,
            "dataChange": data_change,
        }})
    write_commit(table, version, actions)


def _drain(reader, start):
    """One engine turn of the microbatch loop: batches until
    latestOffset stops moving. Returns (rows, committed_offset)."""
    rows = []
    while True:
        end = reader.latestOffset()
        if end == start:
            return rows, start
        for p in reader.partitions(start, end):
            rows.extend(reader.read(p))
        reader.commit(end)
        start = end


# ---------------------------------------------------------------------------
# deltatail
# ---------------------------------------------------------------------------


def test_deltatail_protocol_restart_exactly_once(tmp_path):
    """Drain 2 commits, record the committed offset, land 2 MORE
    commits, then resume with a FRESH reader (= restarted driver)
    from that offset: the union must hold every commit exactly once."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    _delta_commit(table, 0, "f0.parquet", list(range(0, 5)))
    _delta_commit(table, 1, "f1.parquet", list(range(5, 10)))

    opts = {"path": table, "columns": "k"}
    r1 = _DeltaTailReader(opts)
    assert r1.initialOffset() == {"version": -1}
    rows1, committed = _drain(r1, r1.initialOffset())
    assert sorted(r[0] for r in rows1) == list(range(10))
    assert committed == {"version": 1}

    _delta_commit(table, 2, "f2.parquet", list(range(10, 15)))
    _delta_commit(table, 3, "f3.parquet", list(range(15, 20)))
    r2 = _DeltaTailReader(opts)  # restart: in-memory state gone
    # the engine's FIRST restart call is latestOffset; it must never
    # regress below the checkpointed offset (the round-10 bug)
    assert r2.latestOffset()["version"] >= committed["version"]
    rows2, committed2 = _drain(r2, committed)
    assert sorted(r[0] for r in rows2) == list(range(10, 20))
    assert committed2 == {"version": 3}


def test_deltatail_uncommitted_batch_replays_identically(tmp_path):
    """WAL replay: a batch planned but not committed before a crash is
    re-executed from partitions(start, end) on a fresh reader — the
    rows must be byte-identical (deterministic replay)."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    _delta_commit(table, 0, "f0.parquet", [1, 2, 3])
    _delta_commit(table, 1, "f1.parquet", [4, 5])
    opts = {"path": table, "columns": "k"}

    def batch(reader):
        out = []
        for p in reader.partitions({"version": 0}, {"version": 1}):
            out.extend(reader.read(p))
        return out

    assert batch(_DeltaTailReader(opts)) == batch(_DeltaTailReader(opts))


def test_deltatail_log_gap_loud(tmp_path):
    """A MID-RANGE missing commit (log truncated under a live
    checkpoint) must reject loudly, not silently drop data."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    for v in (0, 1, 2):
        _delta_commit(table, v, f"f{v}.parquet", [v])
    os.unlink(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    r = _DeltaTailReader({"path": table, "columns": "k"})
    with pytest.raises(ValueError, match="log gap"):
        r.partitions({"version": -1}, {"version": 2})


def test_deltatail_truncated_prefix_seeds_initial_offset(tmp_path):
    """Standard Delta log retention removes early JSON commits after
    checkpointing: a fresh stream must seed at the earliest AVAILABLE
    commit instead of crashing on version 0."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    for v in (0, 1, 2, 3):
        _delta_commit(table, v, f"f{v}.parquet", [10 + v])
    for v in (0, 1):
        os.unlink(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    r = _DeltaTailReader({"path": table, "columns": "k"})
    assert r.initialOffset() == {"version": 1}
    rows, committed = _drain(r, r.initialOffset())
    assert sorted(x[0] for x in rows) == [12, 13]
    assert committed == {"version": 3}


def test_deltatail_streaming_checkpoint_restart(tmp_path, spark):
    """Full Structured Streaming stop/restart against one checkpoint
    directory: phase 1 drains commits 0-1, the query stops, commit 2
    lands, phase 2 restarts from the SAME checkpoint — the sink must
    hold all 15 rows exactly once (the un-fixed cursor double-counted
    commit 1 here: 20 rows)."""
    from cam_etl_spark.sources.deltatail import register_delta_tail

    register_delta_tail(spark)
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    _delta_commit(table, 0, "f0.parquet", list(range(0, 5)))
    _delta_commit(table, 1, "f1.parquet", list(range(5, 10)))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run(expected):
        q = (
            spark.readStream.format("deltatail")
            .option("path", table)
            .option("schema", "k long")
            .option("columns", "k")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="1 seconds")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= expected:
                    break
            except Exception:
                pass
            time.sleep(1)
        time.sleep(3)  # one more trigger, to expose over-delivery
        q.stop()
        q.awaitTermination()
        return spark.read.parquet(out)

    assert run(10).count() == 10
    _delta_commit(table, 2, "f2.parquet", list(range(10, 15)))
    got = run(15)
    assert got.count() == 15
    assert sorted(r["k"] for r in got.collect()) == list(range(15))


# ---------------------------------------------------------------------------
# deltacdf
# ---------------------------------------------------------------------------


def test_deltacdf_restart_with_compaction_in_replayed_range(tmp_path):
    """Resume across a range that contains an OPTIMIZE: v0-v1 insert
    (drained, committed), then v2 compaction (dataChange=false) and
    v3 a rewrite DELETE land while the stream is down. The resumed
    reader must deliver NOTHING for v2 and exactly v3's retractions —
    no duplicated inserts, no dropped versions."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    _delta_commit(table, 0, "f0.parquet", list(range(0, 5)))
    _delta_commit(table, 1, "f1.parquet", list(range(5, 10)))
    opts = {"path": table, "columns": "k,_change_type,_commit_version"}
    r1 = _DeltaCdfReader(opts)
    rows1, committed = _drain(r1, r1.initialOffset())
    assert sorted(r[0] for r in rows1) == list(range(10))
    assert {r[1] for r in rows1} == {"insert"}
    assert committed == {"version": 1}

    # v2: compaction — rewrite f0+f1 as c0, every action dataChange=false
    _write_pq(os.path.join(table, "c0.parquet"), list(range(10)))
    write_commit(table, 2, [
        {"remove": {"path": "f0.parquet", "deletionTimestamp": 0,
                    "dataChange": False}},
        {"remove": {"path": "f1.parquet", "deletionTimestamp": 0,
                    "dataChange": False}},
        {"add": {"path": "c0.parquet", "partitionValues": {},
                 "size": os.path.getsize(os.path.join(table, "c0.parquet")),
                 "modificationTime": 0, "dataChange": False}},
    ])
    # v3: delete the compacted file (rows 0..9 retracted)
    write_commit(table, 3, [
        {"remove": {"path": "c0.parquet", "deletionTimestamp": 0,
                    "dataChange": True}},
    ])

    r2 = _DeltaCdfReader(opts)  # restart
    assert r2.latestOffset()["version"] >= committed["version"]
    rows2, committed2 = _drain(r2, committed)
    assert committed2 == {"version": 3}
    assert sorted(rows2) == [(k, "delete", 3) for k in range(10)]


def test_deltacdf_partitioned_derived_fragments(tmp_path):
    """Derived insert/delete fragments on a PARTITIONED table: the
    partition column lives in the log's partitionValues, not the
    parquet — read() must inject it (round-9 review: it crashed with
    a KeyError instead)."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    _delta_commit(table, 0, "p=a/f0.parquet", [1, 2],
                  partition_values={"p": "a"})
    r = _DeltaCdfReader(
        {"path": table, "columns": "k,p,_change_type,_commit_version"}
    )
    rows, committed = _drain(r, r.initialOffset())
    assert sorted(rows) == [(1, "a", "insert", 0), (2, "a", "insert", 0)]
    # delete side carries partitionValues too
    write_commit(table, 1, [
        {"remove": {"path": "p=a/f0.parquet", "deletionTimestamp": 0,
                    "dataChange": True, "partitionValues": {"p": "a"}}},
    ])
    rows2, _ = _drain(_DeltaCdfReader(
        {"path": table, "columns": "k,p,_change_type,_commit_version"}
    ), committed)
    assert sorted(rows2) == [(1, "a", "delete", 1), (2, "a", "delete", 1)]


def test_deltacdf_log_gap_loud(tmp_path):
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    for v in (0, 1, 2):
        _delta_commit(table, v, f"f{v}.parquet", [v])
    os.unlink(os.path.join(table, "_delta_log", f"{1:020d}.json"))
    r = _DeltaCdfReader({"path": table, "columns": "k,_change_type"})
    with pytest.raises(ValueError, match="log gap"):
        r.partitions({"version": -1}, {"version": 2})


# ---------------------------------------------------------------------------
# icebergtail
# ---------------------------------------------------------------------------


def _iceberg_entry(path, n=1):
    return {
        "status": 1,
        "snapshot_id": 1,
        "data_file": {
            "content": 0,
            "file_path": path,
            "file_format": "parquet",
            "partition": {},
            "record_count": n,
            "file_size_in_bytes": 1,
        },
    }


def test_icebergtail_protocol_restart_exactly_once(tmp_path):
    """Drain a two-snapshot chain, record the committed position,
    append a third snapshot, resume with a fresh reader: files added
    by the third snapshot arrive exactly once."""
    d = str(tmp_path / "tbl")
    md = os.path.join(d, "metadata")
    os.makedirs(md)
    data = os.path.join(d, "data")
    os.makedirs(data)
    paths = []
    for i in range(3):
        p = os.path.join(data, f"d{i}.parquet")
        _write_pq(p, [i * 10, i * 10 + 1])
        paths.append(p)

    def manifest(name, file_paths):
        m = os.path.join(md, name)
        I.write_manifest(m, [_iceberg_entry(p) for p in file_paths])
        return m

    s1 = I.write_snapshot(d, 101, [manifest("m1.avro", paths[:1])])
    s2 = I.write_snapshot(
        d, 202, [manifest("m2.avro", paths[:2])], parent_id=101
    )
    I.write_table_metadata(d, 1, [s1, s2], 202, [])

    opts = {"path": d, "columns": "k"}
    r1 = _IcebergTailReader(opts)
    assert r1.initialOffset() == {"pos": -1, "snap": None}
    rows1, committed = _drain(r1, r1.initialOffset())
    assert sorted(x[0] for x in rows1) == [0, 1, 10, 11]
    assert committed == {"pos": 1, "snap": 202}

    s3 = I.write_snapshot(
        d, 303, [manifest("m3.avro", paths)], parent_id=202
    )
    I.write_table_metadata(d, 2, [s1, s2, s3], 303, [])
    r2 = _IcebergTailReader(opts)  # restart
    assert r2.latestOffset()["pos"] >= committed["pos"]
    rows2, committed2 = _drain(r2, committed)
    assert sorted(x[0] for x in rows2) == [20, 21]
    assert committed2 == {"pos": 2, "snap": 303}


def test_icebergtail_rejects_remapped_chain(tmp_path):
    """Positions silently REMAP when snapshots expire: the offset
    carries the snapshot id, and a resumed reader must reject a
    changed chain instead of skipping or re-delivering data."""
    d = str(tmp_path / "tbl")
    md = os.path.join(d, "metadata")
    os.makedirs(md)
    data = os.path.join(d, "data")
    os.makedirs(data)
    paths = []
    for i in range(3):
        p = os.path.join(data, f"d{i}.parquet")
        _write_pq(p, [i])
        paths.append(p)

    def manifest(name, file_paths):
        m = os.path.join(md, name)
        I.write_manifest(m, [_iceberg_entry(p) for p in file_paths])
        return m

    s1 = I.write_snapshot(d, 101, [manifest("m1.avro", paths[:1])])
    s2 = I.write_snapshot(d, 202, [manifest("m2.avro", paths[:2])],
                          parent_id=101)
    I.write_table_metadata(d, 1, [s1, s2], 202, [])
    r1 = _IcebergTailReader({"path": d, "columns": "k"})
    rows, committed = _drain(r1, r1.initialOffset())
    assert committed == {"pos": 1, "snap": 202}

    # expire snapshot 101 and land a new one: positions remap
    s3 = I.write_snapshot(d, 303, [manifest("m3.avro", paths)],
                          parent_id=202)
    s2b = dict(s2)
    s2b.pop("parent-snapshot-id", None)  # 202 is now the root
    I.write_table_metadata(d, 2, [s2b, s3], 303, [])
    r2 = _IcebergTailReader({"path": d, "columns": "k"})
    end = r2.latestOffset()
    assert end == {"pos": 1, "snap": 303}
    with pytest.raises(ValueError, match="chain changed"):
        r2.partitions(committed, end)


def test_deltacdf_rejects_truncated_history(tmp_path):
    """A CDF stream over a retention-truncated log must reject at
    start: silently skipping early inserts would hand a downstream
    incremental maintainer a permanently wrong base."""
    table = str(tmp_path / "tbl")
    os.makedirs(table)
    for v in (0, 1, 2):
        _delta_commit(table, v, f"f{v}.parquet", [v])
    os.unlink(os.path.join(table, "_delta_log", f"{0:020d}.json"))
    r = _DeltaCdfReader({"path": table, "columns": "k,_change_type"})
    with pytest.raises(ValueError, match="history truncated"):
        r.initialOffset()
