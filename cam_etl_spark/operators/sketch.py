"""Streaming-sketch operators: summaries whose size is bounded by the
sketch parameter, not the data — the tool family for vocabularies (URLs,
n-grams, ids) too large to aggregate wholesale. Exact-result variants
only: approximation is confined to candidate generation, so every catalog
result stays SQL-oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    docs: DataFrame,
    k: int = 40,
    text_col: str = "text",
    token_split: str = "[^a-z0-9]+",
) -> DataFrame:
    """EXACT distributed heavy hitters: every term with corpus frequency
    strictly greater than N/(k+1), via the classic two-pass scheme.

    Pass 1 runs a Misra-Gries(k) summary PER PARTITION (mapInPandas with
    state carried across the partition's Arrow batches — k counters,
    decrement-all when full). MG guarantees any item with partition
    frequency > n_p/(k+1) survives its partition summary; since a global
    heavy hitter exceeds N/(k+1) = (sum n_p)/(k+1), it must exceed
    n_p/(k+1) in at least one partition, so the union of partition
    summaries contains every global heavy hitter. Pass 2 recounts ONLY
    the candidate terms exactly (broadcast semi-join + one keyed groupBy)
    and filters by the true threshold — no approximation survives into
    the result, which is why a plain SQL oracle can check it.

    Scale shape: pass 1 is a scan emitting at most k rows per partition;
    pass 2 shuffles only candidate-term rows (≤ k x partitions distinct
    terms). The full term histogram is never materialized — the point of
    the sketch when the vocabulary (URLs, n-grams, user ids) is too large
    to groupBy wholesale.
    """
    if k < 1:
        raise ValueError("heavy_hitters: k must be >= 1")
    toks = docs.select(
        F.explode(F.split(F.lower(text_col), token_split)).alias("term")
    ).filter(F.col("term") != "")

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for term in pdf["term"]:
                if term in counters:
                    counters[term] += 1
                elif len(counters) < k:
                    counters[term] = 1
                else:
                    dead = [t for t in counters if counters[t] == 1]
                    for t in counters:
                        counters[t] -= 1
                    for t in dead:
                        del counters[t]
        yield pd.DataFrame({"term": list(counters.keys())})

    cands = toks.mapInPandas(mg, "term string").distinct()
    total = toks.agg(F.count("*").alias("total"))
    return (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * (k + 1) > F.col("total"))
        .select("term", "freq")
    )
