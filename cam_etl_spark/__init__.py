"""cam_etl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Spatial-Information-QLD/cam-etl.

The reference (see /root/reference, SURVEY.md) is a batch dataflow engine:
relational extraction (multi-way joins, filters, dedup, window-ish history
sequencing, spatial joins incl. KNN), per-row fan-out into an RDF quad model,
broadcast vocabulary lookups, deterministic ID minting, and
count-reconciliation queries over the result. This package re-expresses that
surface as idiomatic Spark DataFrame/SQL plans so Catalyst + Tungsten plan
the physical execution, plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) the reference
lacks.

Layout:
  session     — tuned SparkSession builder
  schemas     — explicit StructTypes (testdata + CAM source tables)
  io          — table loaders and sinks (parquet/CSV/JDBC, N-Quads)
  quads       — RDF quad model: schema, N-Quads escaping, writer
  functions/  — scalar expression helpers (ids, strings, temporal, spatial,
                text, vectors) — all JVM-side except the uuid5 fidelity UDF
  operators/  — composite operators (dedup, similarity, knn, hierarchy,
                history, vocab, fanout)
  streaming/  — stream-safe transforms shared between batch and streaming
  multimodal/ — binary-column plumbing with stubbed decoders
  plans/      — the query catalog exposed through __spark_entry__
"""

__version__ = "0.1.0"
