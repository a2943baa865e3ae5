"""Training-data hygiene operators: PII redaction, repetition signals,
temperature mixing, semantic dedup."""

import pytest
from pyspark.sql import functions as F


def test_redact_pii_all_classes(spark):
    from cam_etl_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@ex-ample.co.uk now"),
            (2, "call 555-123-4567 or 555 987 6543"),
            (3, "host 192.168.1.254 and 10.0.0.1"),
            (4, "clean text with no pii at all"),
            (5, ""),
        ],
        "id long, txt string",
    )
    c = pii_counts(F.col("txt"))
    out = df.select(
        "id",
        redact_pii(F.col("txt")).alias("red"),
        c["email"].alias("ne"),
        c["phone"].alias("np"),
        c["ipv4"].alias("ni"),
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[1]["red"] == "mail me at <EMAIL> now" and rows[1]["ne"] == 1
    assert rows[2]["red"] == "call <PHONE> or <PHONE>" and rows[2]["np"] == 2
    assert rows[3]["red"] == "host <IP> and <IP>" and rows[3]["ni"] == 2
    assert rows[4]["red"] == "clean text with no pii at all"
    assert rows[5]["red"] == ""


def test_redact_pii_email_wins_over_ip_fragment(spark):
    # digits-and-dots inside an email's domain must not be half-redacted as
    # an IP: email replacement runs first
    from cam_etl_spark.functions.text import redact_pii

    df = spark.createDataFrame([("x u@10.0.0.1.net y",)], "txt string")
    assert df.select(redact_pii(F.col("txt")).alias("r")).first()["r"] == "x <EMAIL> y"


def test_sample_temperature_flattens_mix(spark):
    from cam_etl_spark.operators.sampling import sample_temperature

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sample_temperature(df, "source", target_rows=200, alpha=0.5)
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # alpha=0.5 weights: sqrt(900)=30, sqrt(100)=10 -> big gets ~150, small ~50
    # (small is up-weighted from its 10% share to ~25%)
    assert 0.10 < by_src["big"] / 900 < 0.25
    assert 0.35 < by_src["small"] / 100 < 0.70
    # deterministic: same draw twice
    again = sample_temperature(df, "source", target_rows=200, alpha=0.5)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_sample_temperature_rate_capped_at_one(spark):
    from cam_etl_spark.operators.sampling import sample_temperature

    df = spark.createDataFrame([(i, "only") for i in range(50)], "doc_id long, source string")
    # target far above corpus: keep everything, never oversample
    assert sample_temperature(df, "source", target_rows=5000).count() == 50


def test_semantic_dedup_drops_within_cluster_only(spark):
    from cam_etl_spark.operators.dedup import semantic_dedup

    # two tight groups along different axes + one isolate; any sane centroid
    # draw separates the axes, and within a group cosine ~= 1
    rows = (
        [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(5)]
        + [(10 + i, [0.0, 0.0, 1.0, 0.001 * i]) for i in range(5)]
        + [(99, [0.0, 1.0, 0.0, 0.0])]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(df, threshold=0.99, n_clusters=4).collect()
    kept = {r["vec_id"] for r in out if r["kept"]}
    dropped = {r["vec_id"] for r in out if not r["kept"]}
    assert len(out) == 11  # one verdict per vector
    assert 99 in kept  # isolate never dropped
    # greedy-by-id: the lowest id of each near-dup group survives
    assert 0 in kept and 10 in kept
    # only group members are ever dropped, and the dedup actually fires
    # (it may under-drop when a dup group straddles two near-identical
    # hash-drawn centroids — SemDeDup's documented approximation)
    assert dropped and dropped <= {1, 2, 3, 4, 11, 12, 13, 14}
    # within every CLUSTER the smallest id is kept
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["centroid_id"], []).append(r)
    for members in by_cluster.values():
        lowest = min(m["vec_id"] for m in members)
        assert next(m for m in members if m["vec_id"] == lowest)["kept"]


def test_semantic_dedup_empty_and_single(spark):
    from cam_etl_spark.operators.dedup import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    assert semantic_dedup(df.filter("vec_id < 0")).count() == 0
    single = semantic_dedup(df).collect()
    assert len(single) == 1 and single[0]["kept"]


def test_repetition_signals_detect_looping_text(spark, sf_dir):
    from cam_etl_spark.plans import QUERIES
    import os

    # catalog query sanity on real data
    df = QUERIES["text_repetition_signals"].spark(spark, sf_dir)
    rows = df.limit(50).collect()
    for r in rows:
        assert 0.0 <= r["dup_word_frac"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0

    # synthetic: pure loop has high dup fraction and one dominant bigram
    loop = spark.createDataFrame(
        [(1, "spam ham " * 50), (2, "all distinct words here now")],
        "doc_id long, text string",
    )
    loop.createOrReplaceTempView("documents_tmp")
    sized = loop.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    ).select(
        "doc_id",
        (1 - F.size(F.array_distinct("toks")) / F.size("toks")).alias("dupf"),
    )
    got = {r["doc_id"]: r["dupf"] for r in sized.collect()}
    assert got[1] > 0.9 and got[2] == 0.0


def test_dedup_keep_best_prefers_quality_then_id(spark):
    from cam_etl_spark.operators.graph import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (9, 5)],  # cluster {1,2,3}: 2 and 3 tie on quality
        "doc_id long, score long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r["id"]: r for r in dedup_keep_best(docs, pairs, "score").collect()}
    assert out[2]["kept"] and not out[1]["kept"] and not out[3]["kept"]
    assert out[9]["kept"]  # singleton survives
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"]


def test_dedup_keep_best_empty_pairs(spark):
    from cam_etl_spark.operators.graph import dedup_keep_best

    docs = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, score long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup_keep_best(docs, pairs, "score").collect()
    assert all(r["kept"] for r in out) and len(out) == 2


def test_unigram_logprob_orders_common_above_rare(spark):
    from cam_etl_spark.plans import QUERIES

    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "zyzzyva qwertyuiop")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("documents")
    # score the tiny corpus directly through the same plan shape
    from pyspark.sql import functions as F
    toks = docs.select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"))
    vocab = toks.groupBy("term").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    scored = toks.join(vocab, "term").join(total).select(
        "doc_id", F.log(F.col("c").cast("double") / F.col("n")).alias("lp"))
    got = {r["doc_id"]: r["s"] for r in scored.groupBy("doc_id").agg(F.avg("lp").alias("s")).collect()}
    assert got[1] > got[2]  # repeated common token scores higher than rare soup
