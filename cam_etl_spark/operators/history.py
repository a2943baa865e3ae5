"""Version-history sequencing (SURVEY W1, T11).

The reference orders address-history rows by version within addr_id and
walks them positionally in Python: last row = current, others retired, each
stage linked to its predecessor via ``prov:wasInformedBy``
(/root/reference/cam/tables/lf_address_history.py:50,85-141). Here the whole
sequencing is one window spec — a single shuffle on the entity key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_history(
    df: DataFrame,
    entity_col: str,
    version_col: str,
    id_col: str,
) -> DataFrame:
    """Adds: seq (1-based position), is_current (last version per entity),
    prev_id (the predecessor's id — the wasInformedBy edge), n_versions."""
    w = Window.partitionBy(entity_col).orderBy(F.col(version_col).asc(), F.col(id_col).asc())
    w_all = Window.partitionBy(entity_col)
    return (
        df.withColumn("seq", F.row_number().over(w))
        .withColumn("prev_id", F.lag(id_col).over(w))
        .withColumn("n_versions", F.count("*").over(w_all))
        .withColumn("is_current", F.col("seq") == F.col("n_versions"))
    )
