"""Bisect the runtime bloom-filter hang (session.py NOTE).

Runs catalog queries with spark.sql.optimizer.runtime.bloomFilter.enabled
and runtimeFilter.semiJoinReduction.enabled ON, one at a time with
wall-clock logging, so an external ``timeout`` wrapper identifies the
query that deadlocks (the last "START" without a "DONE").

    timeout 500 python tools/bisect_bloom.py [first_n | name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from cam_etl_spark.plans import QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bloom_bisect")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = list(QUERIES)
    if len(sys.argv) > 1:
        if sys.argv[1].isdigit():
            names = names[: int(sys.argv[1])]
        else:
            names = sys.argv[1:]

    for name in names:
        t0 = time.time()
        print(f"START {name}", flush=True)
        try:
            QUERIES[name].spark(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"DONE  {name} [{time.time()-t0:.1f}s]", flush=True)
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
