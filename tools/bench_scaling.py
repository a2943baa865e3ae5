#!/usr/bin/env python
"""Scaling-curvature bench: run the headline query set across scale factors
and report per-decade time ratios (VERDICT r1 item 10).

A scan-shaped query should scale ~linearly in rows (ratio ≲ 10 per decade,
usually much less while fixed overhead dominates); a candidate-generation
blowup in the dedup/fuzzy family shows up as a super-linear ratio long before
it kills a 100 TB run.

Usage:
    python tools/bench_scaling.py build --factor 10 --out /tmp/sf_amp1
    python tools/bench_scaling.py run --dirs /root/testdata/sf0.01,/root/testdata/sf0.1,/tmp/sf_amp1

`build` amplifies sf0.1 ×N into an ~sf1-equivalent directory. Keys are
shifted per copy (disjoint id spaces, so joins stay 1:1); document text is
word-mangled per copy (every 3rd word salted) so copies are NOT near-dups of
each other — the amplified corpus keeps the original duplicate RATE instead
of turning every doc into an N-clique, which would measure the synthetic
data, not the algorithm. Embeddings get deterministic per-copy jitter.
Dimension tables (region/nation) stay single-copy, as they would at scale.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 1_000_000_000


def _amplified(df, table: str, i: int):
    from pyspark.sql import functions as F

    shift = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }.get(table, [])
    out = df
    for c in shift:
        out = out.withColumn(c, F.col(c) + F.lit(i * KEY_STRIDE))
    if table == "events" and i:
        out = out.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} SECONDS"))
    if table == "documents" and i:
        # salt every 3rd word with a copy/doc-dependent token: shingle overlap
        # with the source copy collapses, so near-dup structure is preserved
        # within each copy, not multiplied across copies
        out = out.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, j: F.when(
                        (j + F.lit(i)) % 3 == 0,
                        F.concat(w, F.lit(f"~a{i}x"), (F.col("doc_id") + j) % 97),
                    ).otherwise(w),
                ),
                " ",
            ),
        ).withColumn("n_chars", F.length("text"))
    if table == "embeddings" and i:
        out = out.withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, j: (x + 0.01 * F.sin(F.col("vec_id") + j + F.lit(i))).cast("float"),
            ),
        )
    return out


def build(src: str, out: str, factor: int) -> None:
    from cam_etl_spark.io import TESTDATA_TABLES, load_table, write_compacted
    from cam_etl_spark.session import get_spark

    spark = get_spark("bench_scaling_build")
    os.makedirs(out, exist_ok=True)
    for table in TESTDATA_TABLES:
        df = load_table(spark, src, table)
        if table in ("region", "nation"):
            amp = df
        else:
            amp = df
            for i in range(1, factor):
                amp = amp.unionByName(_amplified(df, table, i))
        # engine's own compacted sink — right-sized files, no tiny-file fanout
        write_compacted(amp, os.path.join(out, f"{table}.parquet"), target_mb=64)
        print(f"built {table}", file=sys.stderr)


def run(dirs: list[str], repeats: int = 1) -> None:
    """One bench.py subprocess per (dir, repeat); with repeats > 1 the
    per-query time is the MIN across repeats — the standard rejection for
    transient host noise (this VM shows bursts of external load that can
    inflate a single pass 2x; the minimum is the reproducible cost).

    bench.py itself defaults to min-of-2 since round 7; pin its inner
    repeats to 1 so THIS loop owns repetition and the emitted 'repeats'
    field describes the true number of timed passes."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_REPEATS"] = "1"
    results = []
    for d in dirs:
        env["SPARK_GRAFT_SF_DIR"] = d
        rec = None
        t0 = time.perf_counter()
        for _ in range(max(1, repeats)):
            p = subprocess.run(
                [sys.executable, "bench.py"],
                capture_output=True,
                text=True,
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            json_lines = [
                ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")
            ]
            if p.returncode != 0 or not json_lines:
                raise RuntimeError(
                    f"bench.py failed for {d} (rc={p.returncode}); stderr tail:\n"
                    + "\n".join(p.stderr.strip().splitlines()[-15:])
                )
            this = json.loads(json_lines[-1])
            if rec is None:
                rec = this
            else:
                # min over the UNION of query keys: a query present in
                # only one pass (added/failed between repeats) keeps its
                # single timing instead of KeyError-ing or being dropped
                rec["queries"] = {
                    q: min(
                        v
                        for v in (rec["queries"].get(q), this["queries"].get(q))
                        if v is not None
                    )
                    for q in set(rec["queries"]) | set(this["queries"])
                }
        rec["queries"] = {q: round(t, 3) for q, t in rec["queries"].items()}
        rec["value"] = round(sum(rec["queries"].values()), 3)
        rec["dir"] = d
        rec["repeats"] = max(1, repeats)
        rec["wall"] = round(time.perf_counter() - t0, 1)
        results.append(rec)
        print(json.dumps(rec), file=sys.stderr)

    summary = {"runs": results, "ratios": {}}
    for a, b in zip(results, results[1:]):
        key = f"{a['dir']} -> {b['dir']}"
        summary["ratios"][key] = {
            q: round(b["queries"][q] / max(a["queries"][q], 1e-9), 2)
            for q in b["queries"]
            if q in a["queries"]
        }
    print(json.dumps(summary))


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--src", default="/root/testdata/sf0.1")
    b.add_argument("--out", default="/tmp/sf_amp1")
    b.add_argument("--factor", type=int, default=10)
    r = sub.add_parser("run")
    r.add_argument(
        "--dirs",
        default="/root/testdata/sf0.01,/root/testdata/sf0.1",
    )
    r.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()
    if args.cmd == "build":
        build(args.src, args.out, args.factor)
    else:
        run(args.dirs.split(","), args.repeats)


if __name__ == "__main__":
    main()
