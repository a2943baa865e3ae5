"""Source/sink extensions beyond the core readers in cam_etl_spark.io:
vocabulary graphs as broadcast lookup tables (SURVEY S5) and the chunked
search-index sink (SURVEY S11)."""

from cam_etl_spark.sources.vocab import skos_labels, skos_lookup_df  # noqa: F401
from cam_etl_spark.sources.index_sink import (  # noqa: F401
    index_documents,
    jsonl_dir_writer,
)
