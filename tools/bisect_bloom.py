"""Root-cause reproducer for the round-2 "runtime bloom-filter hang".

Verdict (round 4): there was never a bloom-filter problem.

1. ``spark.sql.optimizer.runtime.bloomFilter.enabled`` is Spark 4's
   DEFAULT (true; run mode ``default`` below prints it) and the whole
   catalog runs green under it — it is the config that actually injects
   runtime bloom filters on shuffle joins.
2. The round-2 experiment also set
   ``spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled``, which
   was REMOVED in Spark 4.0.0 ("runtime filter cannot be an IN subquery
   now"). A session carrying a removed conf throws AnalysisException from
   SQLConf.requireDefaultValueOfRemovedConf the first time SessionState
   is instantiated — i.e. on the first ``spark.read``/``spark.sql``.
3. That clean error then never surfaces: PySpark 4.1's
   exception-conversion layer livelocks on it. CapturedException.__str__
   itself issues JVM calls that need SessionState, which throws the same
   AnalysisException, which re-enters convert_exception — unbounded
   recursion of py4j round-trips. jstack shows the py4j command thread
   spinning in classloader lookups (ReflectionCommand.getUnknownMember);
   faulthandler shows python cycling
   convert_exception → __str__ → deco → convert_exception. THAT is the
   "indefinite hang with no completion" of round 2.

Run modes:

    python tools/bisect_bloom.py default     # show bloom defaults, run a join
    python tools/bisect_bloom.py livelock    # reproduce the hang (Ctrl-C / timeout!)
    python tools/bisect_bloom.py surfaced    # same trigger, converter stubbed →
                                             # the real AnalysisException prints

The ``surfaced`` mode is the diagnostic trick worth keeping: stub
pyspark.errors.exceptions.captured.convert_exception BEFORE the failing
call and the underlying Java exception can be printed via
printStackTrace without entering the recursion.
"""

from __future__ import annotations

import sys

REMOVED_CONF = "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled"


def build(extra: dict[str, str]):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[8]")
        .appName("bloom_bisect")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"

    if mode == "default":
        spark = build({})
        print("bloomFilter.enabled:",
              spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"))
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").count()
        print("join under default bloom filters:", j.count(), "groups")
        return

    if mode == "livelock":
        print("setting removed conf", REMOVED_CONF, "- this will hang; use timeout",
              flush=True)
        spark = build({REMOVED_CONF: "true"})
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")  # never returns
        return

    if mode == "surfaced":
        import pyspark.errors.exceptions.captured as cap

        holder: dict = {}

        def stub(e, *a, **k):
            holder["je"] = e
            try:
                name = e.getClass().getName()
            except Exception:
                name = "<unknown>"
            return RuntimeError("stubbed conversion of " + name)

        cap.convert_exception = stub
        spark = build({REMOVED_CONF: "true"})
        try:
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        except Exception as e:
            print("python saw:", e)
            je = holder.get("je")
            if je is not None:
                jvm = spark.sparkContext._jvm
                sw = jvm.java.io.StringWriter()
                je.printStackTrace(jvm.java.io.PrintWriter(sw))
                print(sw.toString()[:2000])
        return

    raise SystemExit(f"unknown mode {mode!r} (default|livelock|surfaced)")


if __name__ == "__main__":
    main()
