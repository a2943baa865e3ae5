from cam_etl_spark.pipelines.address import (  # noqa: F401
    address_labels,
    address_quads,
    bronze_tables,
)
