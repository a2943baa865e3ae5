#!/usr/bin/env python
"""Per-operator profile of one catalog query: runs it with the noop sink
on a UI-enabled session and dumps the SQL-tab node metrics (the executed
adaptive plan), so time maps to operators, not stage ids.

Usage: python tools/sql_profile.py query_name [min_ms]
"""
from __future__ import annotations

import json
import os
import sys
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
        .appName("sql_profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4098")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    q = QUERIES[name]
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    import time
    t0 = time.perf_counter()
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4098/api/v1/applications/{app_id}"
    execs = json.load(urllib.request.urlopen(f"{base}/sql?length=200"))
    # the timed run is the LAST execution (noop save)
    last = max(execs, key=lambda e: e["id"])
    detail = json.load(
        urllib.request.urlopen(f"{base}/sql/{last['id']}?details=true&planDescription=false")
    )
    print(f"{name}: wall {wall:.3f}s, exec id {last['id']}, {len(detail.get('nodes', []))} nodes")
    rows = []
    for node in detail.get("nodes", []):
        mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
        interesting = {}
        for k, v in mets.items():
            if any(s in k for s in ("time", "rows", "size", "bytes", "spill")):
                interesting[k] = v
        rows.append((node["nodeId"], node["nodeName"], interesting))
    for nid, nname, mets in rows:
        line = ", ".join(f"{k}={v}" for k, v in sorted(mets.items()))
        print(f"  [{nid:3d}] {nname}: {line}")


if __name__ == "__main__":
    main()
