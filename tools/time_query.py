#!/usr/bin/env python
"""Time individual catalog queries with the bench methodology (noop sink,
warm-up pass, min over repeats) — the per-change measurement loop of the
optimization rounds.

Usage: python tools/time_query.py [--repeats 3] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cam_etl_spark.plans import QUERIES  # noqa: E402
from cam_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_query")
    spark.range(1).count()
    for name in args.names:
        q = QUERIES[name]
        q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"{name}: {best:.3f}s (min of {args.repeats})")


if __name__ == "__main__":
    main()
