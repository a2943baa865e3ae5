#!/usr/bin/env python
"""Per-stage profile of one catalog query: runs it with the noop sink on a
UI-enabled session and dumps stage metrics (executor run time, task count,
input/shuffle bytes) from the REST API, slowest first.

Usage: python tools/profile_query.py query_name
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from cam_etl_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_query")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    q = QUERIES[name]
    # warm-up (untimed, not profiled separately)
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    marker_t0 = time.time() * 1000
    spark.sparkContext.setJobDescription(f"profile:{name}")
    t0 = time.perf_counter()
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    rows = []
    for s in stages:
        if s.get("completionTime") is None:
            continue
        # keep only stages submitted after the marker (the timed run)
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        try:
            ts = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
        except Exception:
            ts = 0
        if ts < marker_t0 - 2000:
            continue
        rows.append(
            (
                s["executorRunTime"],
                s["stageId"],
                s["numCompleteTasks"],
                s.get("inputBytes", 0),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                (s.get("name") or "")[:90],
            )
        )
    rows.sort(reverse=True)
    print(f"{name}: wall {wall:.3f}s, {len(rows)} stages in timed run")
    print("  runMs stage tasks    inMB  shRdMB  shWrMB  name")
    for r in rows[:25]:
        print(
            f"  {r[0]:6d} {r[1]:5d} {r[2]:5d} {r[3]/1e6:7.1f} "
            f"{r[4]/1e6:7.1f} {r[5]/1e6:7.1f}  {r[6]}"
        )


if __name__ == "__main__":
    main()
