"""Deduplication operators for the documents table: exact, n-gram Jaccard,
MinHash+LSH, SimHash. The reference's dedup surface is groupBy-HAVING
duplicate detection and DISTINCT-then-join (SURVEY A4/J4,
/root/reference/etl-notes.md:486-510); these extend it to near-dup detection
at training-data scale.

Scale notes (100 TB): every operator here avoids the O(n²) cross join —
candidate pairs come from equi-join shuffles on content-derived keys
(fingerprint, shingle, band hash, hamming block), so the shuffle volume is
proportional to data + duplicate mass, not pairs. The pairwise verify step
only runs on bucket-collided candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cam_etl_spark.functions.ids import portable_hash60
from cam_etl_spark.functions.text import doc_fingerprint, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each normalized-content
    fingerprint group. One shuffle on the fingerprint."""
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fp", doc_fingerprint(F.col(text_col)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("fp", "rn")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Fingerprint groups with >1 member (the reference's GROUP BY … HAVING
    count>1 duplicate probe, /root/reference/etl-notes.md:486-510)."""
    return (
        df.withColumn("fp", doc_fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard similarity over k-word shingle sets for all candidate
    pairs sharing ≥1 shingle.

    Plan shape: explode shingles → self-equi-join on shingle (inverted
    index, NOT a cross join) → count shared shingles per pair → Jaccard from
    |A∩B| / (|A|+|B|-|A∩B|). The shingle join is the only shuffle that
    scales with corpus size; hot shingles can be frequency-capped upstream.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), k)).alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("set_size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("set_size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """MinHash signature per document: for hash function i, the minimum of a
    salted 60-bit shingle hash. Pure expressions — one projection, no
    shuffle; the per-row cost is num_hashes × shingles aggregate folds."""
    shingles = word_shingles(F.col(text_col), k)

    def salted_hash(i: int):
        # one-arg lambda: PySpark maps HOF lambda arity to the function's
        # parameter count, so the salt must be closed over, not a default arg
        return lambda s: F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), s)), 1, 15), 16, 10
        ).cast("long")

    sig = F.array(
        *[F.array_min(F.transform(shingles, salted_hash(i))) for i in range(num_hashes)]
    )
    return df.select(F.col(id_col).alias("id"), sig.alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures and equi-join on (band, band-hash): pairs agreeing
    on all rows of any band collide. Shuffle key = band hash → near-dups
    co-locate, everything else spreads uniformly."""
    n = bands * rows_per_band
    banded = signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verify on the
    candidates only. Returns (id_a, id_b, jaccard ≥ threshold)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, k)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    verified = ngram_jaccard_pairs(df, text_col, id_col, k, threshold)
    return cands.join(verified, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash over word shingles: bit j of the hash is 1 iff the
    sum over shingles of ±1 (by bit j of the shingle hash) is positive.
    Near-dups differ in few bits (small Hamming distance)."""
    shingles = word_shingles(F.col(text_col), 1)
    h = F.transform(shingles, lambda s: portable_hash60(s))

    def vote(j: int):
        return lambda acc, v: acc + F.when(
            F.shiftright(v, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    bit_votes = [F.aggregate(h, F.lit(0), vote(j)) for j in range(min(bits, 60))]
    sim = None
    for j, vote in enumerate(bit_votes):
        term = F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim.bitwiseOR(term)
    return df.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def simhash_near_pairs(sims: DataFrame, max_hamming: int = 3, blocks: int = 4) -> DataFrame:
    """Hamming-ball pairing at scale: split the 60-bit hash into ``blocks``
    segments; by pigeonhole any pair within ``max_hamming < blocks`` bits
    agrees on ≥1 whole segment → equi-join per segment, then verify the true
    Hamming distance with bit_count(xor)."""
    width = 60 // blocks
    seg = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("segment"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("s"),
    ).select("id", "simhash", "s.block", "s.segment")
    a, b = seg.alias("a"), seg.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.segment") == F.col("b.segment"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
