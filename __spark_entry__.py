"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-way join + quad fan-out at
sf0.001; ``queries()``/``oracle_sql()`` expose the full catalog in
cam_etl_spark.plans (one entry per SURVEY.md §2 operator family plus the
training-data-pipeline extensions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from cam_etl_spark.plans import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the reference's full address
    extraction pipeline — stringly bronze tables in the LALF shapes, the
    status-filtered multi-way join, quad fan-out, and byte-exact display
    labels (cam_etl_spark.pipelines.address)."""
    return QUERIES["cam_address_labels"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Every registered query carries an
    oracle twin — the ops DuckDB can't compute natively (uuid5, minhash-LSH
    banding, LSH ANN, the multimodal decoders) are oracled via deterministic
    VALUES fixtures asserting the engine's exact expected output, so the
    driver's compare runs rows+schema+hash for the full catalog (0
    rows-only)."""
    return {
        name: q.oracle_text()
        for name, q in QUERIES.items()
        if q.oracle is not None
    }
