#!/usr/bin/env python
"""Wall-clock stage timeline of one catalog query: when each stage of the
timed (second) run was submitted/completed, to expose serialization gaps
that per-stage executor time hides.

Usage: python tools/stage_timeline.py query_name
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from cam_etl_spark.plans import QUERIES  # noqa: E402


def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stage_timeline")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4097")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    q = QUERIES[name]
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t_start = time.time()
    t0 = time.perf_counter()
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4097/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    rows = []
    for s in stages:
        if s.get("completionTime") is None or s.get("submissionTime") is None:
            continue
        sub, comp = ts(s["submissionTime"]), ts(s["completionTime"])
        if comp < t_start - 0.5:
            continue
        rows.append((sub - t_start, comp - t_start, s["stageId"],
                     s["numCompleteTasks"], s["executorRunTime"]))
    rows.sort()
    print(f"{name}: wall {wall:.3f}s")
    print("   sub    comp   stage tasks execMs")
    for r in rows:
        bar_start = int(max(0, r[0]) * 20)
        bar_len = max(1, int((r[1] - max(0, r[0])) * 20))
        print(f"  {r[0]:6.2f} {r[1]:7.2f} {r[2]:5d} {r[3]:5d} {r[4]:6d}  "
              + " " * bar_start + "#" * bar_len)


if __name__ == "__main__":
    main()
