#!/usr/bin/env python
"""Headline benchmark: runs the bench-flagged catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
     "repeats": R}

Each query is timed end-to-end (plan + execute + a count-style consume).
Per-query timings are the MINIMUM over R timed passes (default 2,
override with $SPARK_GRAFT_BENCH_REPEATS or --repeats N): this host shows
external load bursts that can inflate a single pass of an untouched query
by 50-100%, and min-of-N is the standard way to measure the code rather
than the neighbours (same policy as tools/bench_scaling.py). The headline
value is the sum of per-query minima.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cam_etl_spark.plans import QUERIES  # noqa: E402
from cam_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir
    def _int_or_die(raw: str, what: str) -> int:
        try:
            return int(raw)
        except ValueError:
            sys.exit(f"bench.py: {what} must be an integer, got {raw!r}")

    repeats = _int_or_die(
        os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"),
        "$SPARK_GRAFT_BENCH_REPEATS",
    )
    if "--repeats" in sys.argv:
        i = sys.argv.index("--repeats")
        if i + 1 >= len(sys.argv):
            sys.exit("bench.py: --repeats needs a value")
        repeats = _int_or_die(sys.argv[i + 1], "--repeats")
    repeats = max(1, repeats)

    spark = get_spark("cam_etl_spark_bench")

    # Fixed alphabetical order, decoupled from the catalog's driver-sweep
    # rotation, so per-query timings are comparable across rounds (the
    # rotation reordering manufactured phantom regressions in round 3).
    bench_queries = {n: QUERIES[n] for n in sorted(QUERIES) if QUERIES[n].bench}
    # Warm-up: session startup, then one full UNTIMED pass over every
    # bench query. Codegen caches, Arrow init, broadcast machinery, and FS
    # caches all reach steady state, so the timed passes measure the plan,
    # not the query's position in the run order (round 3's per-query
    # deltas were dominated by who ran first; ~2.4 s of one-time warmup
    # landed on whichever query led).
    spark.range(1).count()
    for q in bench_queries.values():
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for _ in range(repeats):
        for name, q in bench_queries.items():
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            # Force full execution of every operator (count() alone can
            # prune projections; write.noop consumes all columns).
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            if name not in timings or t < timings[name]:
                timings[name] = t
    timings = {n: round(t, 3) for n, t in timings.items()}

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "repeats": repeats,
            }
        )
    )


if __name__ == "__main__":
    main()
