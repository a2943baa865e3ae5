"""Temporal joins: as-of (backward, inclusive, tolerance) and keyless
interval join (bucketed range join) — operators/temporal.py. The DuckDB
ASOF JOIN / inequality-join oracles cover the bulk semantics at sf0.01;
these tests pin the edges."""

import datetime

import pytest
from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:00"), 100.0),
            (2, "A", _ts("2024-01-01 10:05:00"), 101.0),
            (3, "B", _ts("2024-01-01 10:01:00"), 50.0),
            (4, "C", _ts("2024-01-01 09:00:00"), 7.0),
        ],
        "trade_id long, sym string, ts timestamp, px double",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 09:59:00"), 99.5),
            ("A", _ts("2024-01-01 10:05:00"), 100.5),  # equal-ts: inclusive
            ("A", _ts("2024-01-01 10:06:00"), 102.5),  # future: never matched
            ("B", _ts("2024-01-01 08:00:00"), 49.0),
            # C has no quotes at all
        ],
        "sym string, ts timestamp, bid double",
    )


def test_asof_backward_inclusive(spark, trades, quotes):
    from cam_etl_spark.operators.temporal import asof_join

    out = asof_join(trades, quotes, on="sym").orderBy("trade_id").collect()
    # trade 4 (sym C, no quote) dropped — inner semantics
    assert [r.trade_id for r in out] == [1, 2, 3]
    by_id = {r.trade_id: r for r in out}
    assert by_id[1].asof_bid == 99.5  # strictly before
    assert by_id[2].asof_bid == 100.5  # equal ts matches (inclusive)
    assert by_id[2].asof_ts == _ts("2024-01-01 10:05:00")
    assert by_id[3].asof_bid == 49.0  # hours-old quote still matches
    # left payload is preserved untouched
    assert by_id[1].px == 100.0 and by_id[1].sym == "A"


def test_asof_tolerance(spark, trades, quotes):
    from cam_etl_spark.operators.temporal import asof_join

    out = asof_join(trades, quotes, on="sym", tolerance_seconds=120).collect()
    # B's only quote is 2h old -> outside tolerance; A's matches survive
    assert sorted(r.trade_id for r in out) == [1, 2]


def test_asof_empty_sides(spark, trades, quotes):
    from cam_etl_spark.operators.temporal import asof_join

    empty_l = trades.filter("trade_id < 0")
    empty_r = quotes.filter("bid < 0")
    assert asof_join(empty_l, quotes, on="sym").count() == 0
    assert asof_join(trades, empty_r, on="sym").count() == 0


def test_asof_matches_duckdb(spark, sf_dir):
    """Same events-derived frames as the catalog query, cross-checked
    against DuckDB's native ASOF JOIN at sf0.001."""
    import duckdb

    from cam_etl_spark.io import load_table
    from cam_etl_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    got = {
        (r.event_id, r.asof_ts, round(r.asof_value, 6))
        for r in asof_join(clicks, views, on="user_id", right_payload=["value"]).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')")
    want = {
        (eid, ts, round(val, 6))
        for eid, ts, val in con.execute(
            """
            WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click'),
                 views  AS (SELECT user_id, ts, value FROM events WHERE event_type='view')
            SELECT c.event_id, v.ts, v.value
            FROM clicks c ASOF JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts
            """
        ).fetchall()
    }
    assert got == want


def test_interval_join_boundaries_and_multibucket(spark):
    from cam_etl_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00")),  # == start (inclusive)
            (2, _ts("2024-01-01 10:30:00")),  # == end (inclusive)
            (3, _ts("2024-01-01 10:30:01")),  # just past end
            (4, _ts("2024-01-01 09:59:59")),  # just before start
            (5, _ts("2024-01-01 10:15:00")),  # interior, different bucket than ends
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    # bucket (300s) much smaller than the interval: it spans 7 buckets
    out = interval_join(points, intervals, bucket_seconds=300)
    assert sorted(r.pid for r in out.collect()) == [1, 2, 5]
    # each qualifying pair appears exactly once (a point is in ONE bucket)
    assert out.count() == out.distinct().count() == 3
    # huge buckets (interval fits in 1-2 buckets) give the same answer
    out2 = interval_join(points, intervals, bucket_seconds=86400)
    assert sorted(r.pid for r in out2.collect()) == [1, 2, 5]


def test_interval_join_column_collision(spark):
    from cam_etl_spark.operators.temporal import interval_join

    df = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))], "x long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
        "x long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(ValueError, match="collision"):
        interval_join(df, iv)


def test_asof_reserved_column_guard(spark):
    """A left frame whose columns collide with asof_join's internal names
    (_ts, _r_<payload>, …) must be rejected loudly, not silently corrupted."""
    from cam_etl_spark.operators.temporal import asof_join

    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), 9.0)], "k long, ts timestamp, px double"
    )
    bad_ts = spark.createDataFrame(
        [(1, _ts("2024-01-01 01:00:00"), 0.0)], "k long, ts timestamp, _ts double"
    )
    with pytest.raises(ValueError, match="_ts"):
        asof_join(bad_ts, right, on="k")
    bad_payload = spark.createDataFrame(
        [(1, _ts("2024-01-01 01:00:00"), 0.0)], "k long, ts timestamp, _r_px double"
    )
    with pytest.raises(ValueError, match="_r_px"):
        asof_join(bad_payload, right, on="k")
