"""SURVEY S1/S2 — partitioned JDBC scan + subquery pushdown.

Two layers of proof:

1. Symbolic (fast, exhaustive): the partition slicing the reference
   hand-rolls with 10k OFFSET/LIMIT batches
   (/root/reference/cam/etl/__init__.py:34-52) and the pushed-down
   derived-table SQL (/root/reference/cam/tables/__init__.py:16-25) are
   generated pure and executed against DuckDB to prove the disjoint-cover
   invariant: every row — including NULL keys and keys outside
   [lowerBound, upperBound) — is read by exactly one partition.
2. LIVE (end-to-end): Spark ships the embedded Apache Derby JDBC driver,
   so the scan itself runs for real — the bottom tests (and catalog query
   s1_jdbc_live_scan) write testdata into Derby through Spark's JDBC sink
   and read it back through the same partitioned-scan/pushdown helpers.
"""

import duckdb
import pytest

from cam_etl_spark.io import (
    jdbc_partition_predicates,
    jdbc_scan_options,
    jdbc_subquery,
)


def _cover_counts(preds, keys):
    """For each key value, how many partition predicates match it."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INTEGER)")
    con.executemany("INSERT INTO t VALUES (?)", [(k,) for k in keys])
    counts = {}
    for k in keys:
        cond = "id IS NULL" if k is None else f"id = {k}"
        n = 0
        for p in preds:
            n += con.execute(f"SELECT count(*) FROM t WHERE ({p}) AND {cond}").fetchone()[0]
        counts[k] = n
    con.close()
    return counts


def test_partition_predicates_boundary_shape():
    preds = jdbc_partition_predicates("id", 0, 10, 4)
    assert preds == [
        "id < 2 OR id IS NULL",
        "id >= 2 AND id < 4",
        "id >= 4 AND id < 6",
        "id >= 6",
    ]


def test_partition_predicates_spark_stride_semantics():
    # Spark's stride is trunc(upper/num) - trunc(lower/num), NOT
    # (upper-lower)/num: for (5, 100, 8) that's 12 (not 11), first
    # boundary at 17 — these are the slices a real partitioned JDBC scan
    # issues, pinned so the helper never drifts from production Spark.
    preds = jdbc_partition_predicates("id", 5, 100, 8)
    assert preds[0] == "id < 17 OR id IS NULL"
    assert preds[1] == "id >= 17 AND id < 29"
    assert preds[-1] == "id >= 89"


def test_partition_predicates_disjoint_cover_with_nulls_and_outliers():
    # keys far outside [lower, upper) and NULLs must still be read once:
    # bounds shape parallelism, they are NOT a row filter.
    keys = [None, -50, 0, 1, 2, 3, 9, 10, 11, 9_999]
    preds = jdbc_partition_predicates("id", 0, 10, 4)
    counts = _cover_counts(preds, [k for k in keys if k is not None])
    assert all(n == 1 for n in counts.values()), counts
    # NULL lands in the first slice only
    assert "IS NULL" in preds[0]
    assert not any("IS NULL" in p for p in preds[1:])


@pytest.mark.parametrize(
    "lower,upper,num",
    [(0, 10, 4), (5, 100, 8), (-20, 20, 3), (0, 7, 16), (3, 4, 4), (0, 10, 1)],
)
def test_partition_predicates_cover_exactly_once(lower, upper, num):
    keys = sorted({lower - 3, lower, lower + 1, (lower + upper) // 2,
                   upper - 1, upper, upper + 7})
    counts = _cover_counts(jdbc_partition_predicates("id", lower, upper, num), keys)
    assert all(n == 1 for n in counts.values()), counts


def test_partition_predicates_degenerate_ranges():
    # one partition, or an empty/inverted range: single full-scan predicate
    assert jdbc_partition_predicates("id", 0, 10, 1) == ["1=1"]
    assert jdbc_partition_predicates("id", 10, 10, 4) == ["1=1"]
    assert jdbc_partition_predicates("id", 10, 3, 4) == ["1=1"]
    # more partitions than distinct values: clamps, never emits empty slices
    preds = jdbc_partition_predicates("id", 0, 3, 16)
    assert len(preds) == 3


def test_subquery_wrapping():
    assert jdbc_subquery("SELECT a, b FROM t WHERE x > 1;") == (
        "(SELECT a, b FROM t WHERE x > 1) subq"
    )
    assert jdbc_subquery("  SELECT 1  ", alias="q") == "(SELECT 1) q"


def test_scan_options_plain_table():
    opts = jdbc_scan_options("jdbc:postgresql://db/cam", "lalfdb.lalfpdba_lf_address")
    assert opts["dbtable"] == "lalfdb.lalfpdba_lf_address"
    assert opts["fetchsize"] == "10000"  # the reference's cursor batch size
    assert "partitionColumn" not in opts


def test_scan_options_partitioned_subquery_pushdown():
    sql = "SELECT addr_id, locality FROM lalfdb.address WHERE status = 'C'"
    opts = jdbc_scan_options(
        "jdbc:postgresql://db/cam",
        sql,
        partition_column="addr_id",
        num_partitions=16,
        lower_bound=0,
        upper_bound=4_000_000,
        pushdown_predicate="locality IS NOT NULL",
    )
    # the whole extraction query stays a derived table the DB plans (S2) …
    assert opts["dbtable"].startswith("(SELECT * FROM (SELECT addr_id")
    assert opts["dbtable"].endswith("WHERE locality IS NOT NULL) f")
    # … and the Spark-side slicing matches the declared parallelism (S1)
    assert opts["partitionColumn"] == "addr_id"
    assert opts["numPartitions"] == "16"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "4000000"
    # derived-table SQL must be valid — DuckDB parses the shape
    con = duckdb.connect()
    con.execute("CREATE SCHEMA lalfdb")
    con.execute("CREATE TABLE lalfdb.address (addr_id INT, locality TEXT, status TEXT)")
    con.execute("INSERT INTO lalfdb.address VALUES (1,'X','C'),(2,NULL,'C'),(3,'Y','H')")
    rows = con.execute(f"SELECT count(*) FROM {opts['dbtable']}").fetchone()[0]
    con.close()
    assert rows == 1  # status='C' AND locality IS NOT NULL


def test_scan_options_pushdown_on_plain_table():
    opts = jdbc_scan_options(
        "jdbc:postgresql://db/cam",
        "lalfdb.parcel",
        pushdown_predicate="parcel_status = 'A'",
    )
    con = duckdb.connect()
    con.execute("CREATE SCHEMA lalfdb")
    con.execute("CREATE TABLE lalfdb.parcel (parcel_id INT, parcel_status TEXT)")
    con.execute("INSERT INTO lalfdb.parcel VALUES (1,'A'),(2,'B')")
    rows = con.execute(f"SELECT count(*) FROM {opts['dbtable']}").fetchone()[0]
    con.close()
    assert rows == 1


# Property test: any (lower, upper, num) yields a disjoint cover. Predicates
# are evaluated in pure Python (same grammar DuckDB proved above) so the
# property can sweep thousands of cases without a database.
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def _matches(pred: str, v: int | None) -> bool:
        if pred == "1=1":
            return True
        clauses = pred.split(" OR ")
        for cl in clauses:
            if cl == "id IS NULL":
                if v is None:
                    return True
                continue
            if v is None:
                continue
            ok = True
            for part in cl.split(" AND "):
                op_val = part.replace("id ", "")
                if op_val.startswith(">= "):
                    ok &= v >= int(op_val[3:])
                elif op_val.startswith("< "):
                    ok &= v < int(op_val[2:])
                else:
                    raise AssertionError(f"unexpected clause {part!r}")
            if ok:
                return True
        return False

    @settings(max_examples=300, deadline=None)
    @given(
        lower=st.integers(-(10**9), 10**9),
        span=st.integers(0, 10**9),
        num=st.integers(1, 64),
        probe=st.lists(st.one_of(st.none(), st.integers(-(2**40), 2**40)), max_size=8),
    )
    def test_partition_predicates_property_disjoint_cover(lower, span, num, probe):
        upper = lower + span
        preds = jdbc_partition_predicates("id", lower, upper, num)
        keys = set(probe) | {None, lower - 1, lower, upper - 1, upper, upper + 1,
                             lower + span // 2}
        for v in keys:
            n = sum(_matches(p, v) for p in preds)
            assert n == 1, (v, preds)
except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass


# ---------------------------------------------------------------- live Derby
# Spark ships the embedded Apache Derby driver (for the Hive metastore), so
# the scan itself IS testable end-to-end in this harness after all: write a
# testdata slice into a real database through Spark's JDBC sink, then read
# it back through the engine's partitioned-scan and subquery-pushdown
# helpers and check the results against the parquet source.

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/cam_jdbc_db;create=true"


def test_jdbc_live_partitioned_scan_round_trip(spark, sf_dir, tmp_path):
    """S1 for real: partitioned JDBC scan against live embedded Derby.
    Every row lands in exactly one partition (the disjoint-cover invariant
    the predicate unit tests prove symbolically), including rows OUTSIDE
    [lowerBound, upperBound) — bounds shape parallelism, not a filter."""
    from pyspark.sql import functions as F

    from cam_etl_spark.io import load_table, read_jdbc_partitioned

    # uppercase names: Spark's JDBC sink quotes identifiers, and Derby
    # folds unquoted query identifiers to upper case — the mismatch breaks
    # every unquoted downstream query, so normalize at write time
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("CUSTKEY"),
        F.col("c_name").alias("NAME"),
        F.col("c_acctbal").alias("ACCTBAL"),
        F.col("c_mktsegment").alias("MKTSEGMENT"),
    )
    url = _derby_url(tmp_path)
    (c.write.format("jdbc").option("url", url).option("dbtable", "CUSTOMER")
       .option("driver", DERBY_DRIVER).mode("overwrite").save())

    n = c.count()
    # bounds intentionally INSIDE the key range: rows outside must still
    # arrive exactly once via the unbounded first/last slices
    df = read_jdbc_partitioned(
        spark, url, "CUSTOMER",
        partition_column="CUSTKEY", num_partitions=4,
        lower_bound=10, upper_bound=n - 10, driver=DERBY_DRIVER,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == n
    assert df.select("CUSTKEY").distinct().count() == n  # no dup reads
    # values survive the round trip
    back = {r["CUSTKEY"]: r["MKTSEGMENT"] for r in df.collect()}
    src = {r["CUSTKEY"]: r["MKTSEGMENT"] for r in c.collect()}
    assert back == src


def test_jdbc_live_subquery_pushdown(spark, sf_dir, tmp_path):
    """S2 for real: the derived-table SQL runs INSIDE Derby (a bad column
    or syntax error would abort there), Spark layers scan options on top."""
    from pyspark.sql import functions as F

    from cam_etl_spark.io import jdbc_scan_options, load_table

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ORDERKEY"),
        F.col("o_custkey").alias("CUSTKEY"),
        F.col("o_totalprice").alias("TOTALPRICE"),
        F.col("o_orderstatus").alias("STATUS"),
    )
    url = _derby_url(tmp_path)
    # Spark's default StringType mapping in Derby is CLOB, which cannot be
    # compared to CHAR literals — pin VARCHAR like a real deployment would
    (o.write.format("jdbc").option("url", url).option("dbtable", "ORDERS")
       .option("createTableColumnTypes", "STATUS VARCHAR(1)")
       .option("driver", DERBY_DRIVER).mode("overwrite").save())

    opts = jdbc_scan_options(
        url,
        "SELECT CUSTKEY, COUNT(*) AS N_ORDERS, SUM(TOTALPRICE) AS SPEND "
        "FROM ORDERS WHERE STATUS = 'F' GROUP BY CUSTKEY",
    )
    opts["driver"] = DERBY_DRIVER
    agg = spark.read.format("jdbc").options(**opts).load()

    expect = (
        o.filter(F.col("STATUS") == "F")
        .groupBy("CUSTKEY")
        .agg(F.count("*").alias("N_ORDERS"), F.sum("TOTALPRICE").alias("SPEND"))
    )
    got = {r["CUSTKEY"]: (r["N_ORDERS"], round(float(r["SPEND"]), 2)) for r in agg.collect()}
    want = {r["CUSTKEY"]: (r["N_ORDERS"], round(float(r["SPEND"]), 2)) for r in expect.collect()}
    assert got == want
    # pushdown_predicate folds into the derived table and Derby evaluates it
    opts2 = jdbc_scan_options(url, "ORDERS", pushdown_predicate="TOTALPRICE > 100000")
    opts2["driver"] = DERBY_DRIVER
    filtered = spark.read.format("jdbc").options(**opts2).load()
    assert filtered.count() == o.filter("TOTALPRICE > 100000").count()
