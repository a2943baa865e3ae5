"""Deterministic splitting, stratified sampling, and sequence packing —
the dataset-assembly tail of a training-data pipeline.

The reference's sampling surface is LIMIT probes and count reconciliation
(/root/reference/etl-notes.md:469,510); training pipelines additionally need
(a) reproducible train/val/test assignment, (b) per-stratum downsampling,
and (c) packing documents into fixed-size context windows. None may depend
on Spark's RNG: ``df.sample``/``sampleBy`` draw from per-partition streams,
so the selected SET changes with partitioning/cluster size. Everything here
keys off a content-stable hash (functions/ids.portable_hash60 — md5-based,
reproducible in any engine) so the same row lands in the same split on any
cluster layout, and adding rows never reassigns existing ones.

Scale notes (100 TB): split/sample are pure map-side projections (zero
shuffle, fully pushdown-friendly). Packing needs a running sum, which would
serialize on a global window — so it is SHARDED: hash the doc into one of
``num_shards`` streams, run the cumulative sum per shard (parallel windows),
and emit (shard, bin) sequence ids. Cross-shard packing efficiency loss is
bounded by one partial window per shard; shard count scales with cluster
parallelism, not data size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cam_etl_spark.functions.ids import portable_hash60


def hash_bucket(col: Column, buckets: int = 100) -> Column:
    """Stable [0, buckets) assignment from a key column."""
    return F.pmod(portable_hash60(col.cast("string")), F.lit(buckets))


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train: int = 80,
    val: int = 10,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test label per row: bucket = hash(id) % 100,
    train < ``train`` <= val < ``train``+``val`` <= test. Adding documents
    never moves existing ones between splits (hash, not row position)."""
    b = hash_bucket(F.col(id_col))
    label = (
        F.when(b < train, "train").when(b < train + val, "val").otherwise("test")
    )
    return df.withColumn(out_col, label)


def sample_stratified(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic downsample: keep a row iff
    hash(id) % 10000 < fraction·10000 for its stratum. The selected set is
    independent of partitioning and stable under reruns — unlike
    ``df.sampleBy`` whose draw depends on the per-partition RNG stream."""
    b = hash_bucket(F.col(id_col), 10_000)
    frac = None
    for key, f in fractions.items():
        cond = F.col(stratum_col) == key
        frac = F.when(cond, f) if frac is None else frac.when(cond, f)
    frac = F.lit(default_fraction) if frac is None else frac.otherwise(default_fraction)
    # round before casting: see sample_temperature — a bare cast truncates
    # the one-ulp-under-integer doubles that fraction*10000 produces
    return df.filter(b < F.round(frac * 10_000, 0).cast("long"))


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    ctx_len: int = 4096,
    num_shards: int = 8,
) -> DataFrame:
    """GPT-style stream packing: within each hash shard, documents are
    concatenated in id order into one token stream and chopped into
    ctx_len-token windows. seq_id = the window containing the document's
    FIRST token, offset = that token's position within the window (long
    documents simply continue into following windows). Returns the input
    plus shard, seq_id, offset columns.

    The running sum is per-shard (parallel windows keyed by the hash
    shard), never global — see module scale notes."""
    shard = hash_bucket(F.col(id_col), num_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_count_col).over(w)
    start = cum - F.col(token_count_col)
    return (
        df.withColumn("shard", shard)
        .withColumn(
            "seq_id",
            F.format_string(
                "%s-%s", F.col("shard"), F.floor(start / F.lit(ctx_len)).cast("long")
            ),
        )
        .withColumn("offset", F.pmod(start, F.lit(ctx_len)).cast("long"))
    )


def cross_split_contamination(
    pairs: DataFrame,
    splits: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    train_label: str = "train",
) -> DataFrame:
    """Train→eval contamination report: near-duplicate pairs that straddle
    the train boundary.

    ``pairs`` is any (id_a, id_b, jaccard) near-dup pair frame (exact,
    MinHash-LSH, SimHash — interchangeable); ``splits`` the (id, split)
    assignment. An eval document is contaminated when a near-duplicate of
    it landed in train — the standard eval-decontamination pass of an LLM
    training pipeline. Both joins are equi-joins on the id (the splits side
    is a cheap projection — broadcastable when splits come from
    ``split_assign`` it's the corpus, so it shuffles; pair count ≪ corpus
    so the pair side is the small probe side).
    """
    sp_a = splits.select(
        F.col(id_col).alias("id_a"), F.col(split_col).alias("split_a")
    )
    sp_b = splits.select(
        F.col(id_col).alias("id_b"), F.col(split_col).alias("split_b")
    )
    is_train_a = F.col("split_a") == train_label
    is_train_b = F.col("split_b") == train_label
    return (
        pairs.join(sp_a, "id_a")
        .join(sp_b, "id_b")
        .filter(is_train_a != is_train_b)
        .select(
            F.when(is_train_a, F.col("id_b")).otherwise(F.col("id_a")).alias("eval_doc_id"),
            F.when(is_train_a, F.col("split_b")).otherwise(F.col("split_a")).alias("eval_split"),
            F.when(is_train_a, F.col("id_a")).otherwise(F.col("id_b")).alias("train_doc_id"),
            "jaccard",
        )
    )


def sample_temperature(
    df: DataFrame,
    stratum_col: str,
    target_rows: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain re-sampling: draw ~``target_rows`` rows with
    per-stratum weight n_s^alpha (alpha<1 flattens the source mix toward
    uniform — the standard multi-domain LM recipe; alpha=1 is proportional,
    alpha=0 uniform). Per-stratum keep-rate = min(1, target·w_s/Σw / n_s),
    applied as the same deterministic hash predicate as sample_stratified —
    partitioning-independent and reproducible by the SQL oracle.

    Scale shape: one count agg over the corpus (map-side combine, #strata
    result rows), a scalar total joined by literal-true (both sides tiny),
    then a BROADCAST join of the rates back onto the corpus — no corpus
    shuffle anywhere. Rates are rounded to 4dp so the bucket threshold is
    integer-exact in any engine's float formatting."""
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_s"))
    weighted = counts.withColumn("w_s", F.pow(F.col("n_s").cast("double"), F.lit(alpha)))
    total = weighted.agg(F.sum("w_s").alias("sum_w"))
    rates = (
        weighted.join(total)  # 1-row cross: #strata × 1
        .withColumn(
            "keep_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_rows)) * F.col("w_s") / F.col("sum_w") / F.col("n_s"),
                ),
                4,
            ),
        )
        .select(stratum_col, "keep_rate")
    )
    b = hash_bucket(F.col(id_col), 10_000)
    # ROUND before the integer cast: rate*10000 is integer-valued only in
    # exact arithmetic — in binary floating point ~11% of 4dp rates land
    # just below the integer (0.1667*10000 = 1666.9999…), and a bare cast
    # TRUNCATES in Spark while ANSI engines (the DuckDB oracle) round —
    # off-by-one-bucket divergence. round() agrees everywhere.
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(b < F.round(F.col("keep_rate") * 10_000, 0).cast("long"))
        .drop("keep_rate")
    )
