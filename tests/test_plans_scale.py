"""Physical-plan shape assertions for flagship queries — the scale
properties bench measures indirectly, pinned as hard test failures:
broadcasts where dimensions are small, no cartesian products anywhere,
pushed parquet filters on selective scans, and shuffle counts that do
not regress. Wrong plans at sf0.01 are wrong plans at 100 TB."""

import pytest


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qcat():
    from cam_etl_spark.plans import QUERIES

    return QUERIES


def test_no_cartesian_products_in_flagships(spark, sf_dir, qcat):
    """No flagship plan may contain a CartesianProduct or a non-broadcast
    NestedLoopJoin — the O(n^2)-shuffle class that kills a 100 TB run."""
    for name in (
        "cam_address_labels",
        "j1_multiway_join_agg",
        "j10_knn_nearest",
        "dedup_minhash_lsh",
        "dedup_substring_spans",
        "text_bigram_perplexity",
        "ann_pq_adc",
    ):
        plan = _plan(qcat[name].spark(spark, sf_dir))
        assert "CartesianProduct" not in plan, name


def test_etl_end_to_end_plan_shape(spark, sf_dir, qcat):
    """The composed ETL run: every dimension join must broadcast (the
    fact side never shuffles for dims), no sort-merge joins, no
    cartesians; the only nested-loop joins are the three 1-row scalar
    metric frames being stitched together."""
    plan = _plan(qcat["etl_end_to_end_counts"].spark(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2  # 1-row scalar stitches
    assert "BroadcastHashJoin" in plan


def test_pq_adc_single_real_shuffle(spark, sf_dir, qcat):
    """PQ/ADC: the codebook must arrive broadcast and the corpus must
    shuffle at most for the one vec_id aggregation + the k-row TakeOrdered
    — no window exchange over the corpus, no self-join."""
    plan = _plan(qcat["ann_pq_adc"].spark(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    # corpus-wide window would appear as Window over a full-table sort
    assert plan.count("Exchange") <= 6  # agg + take-ordered machinery


def test_substring_spans_scan_side_pushdown(spark, sf_dir, qcat):
    """The gram pipeline reads only (doc_id, text): column pruning must
    reach the parquet scan."""
    plan = _plan(qcat["dedup_substring_spans"].spark(spark, sf_dir))
    assert "ReadSchema" in plan
    read = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "text" in read and "lang" not in read, read


def test_classifier_weights_broadcast(spark, sf_dir, qcat):
    """The weight table must broadcast; the doc-bucket aggregation is the
    only corpus shuffle."""
    plan = _plan(qcat["text_quality_classifier"].spark(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_zorder_groupby_partial_aggregation(spark, sf_dir, qcat):
    """Z-order bucketing must partial-aggregate map-side (HashAggregate
    appears both below and above the exchange)."""
    plan = _plan(qcat["spatial_zorder_cluster"].spark(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_widen_is_conditional(spark):
    """widen() must add a round-robin exchange ONLY for scans narrower
    than the cluster width — at real scale (>= cores splits) the plan is
    untouched, so the helper can never become a 100 TB full-table
    shuffle."""
    from cam_etl_spark.plans.catalog import widen

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    wide = spark.range(1000).repartition(par)
    assert widen(narrow).rdd.getNumPartitions() == par
    # already at cluster width: same object back, no exchange added
    assert widen(wide) is wide
