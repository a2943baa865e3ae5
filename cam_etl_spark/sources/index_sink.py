"""Search-index sink (SURVEY S11).

The reference indexes addresses by chunked SPARQL CONSTRUCT → 10k-document
batches → Meilisearch / Redis FT (/root/reference/meili/index_addr.py:86-160,
/root/reference/meili/main.py:1-60), with facet schema declared via
update_filterable_attributes (/root/reference/meili/update_filterable.py:1-8).

Spark-first equivalent: ``df.foreachPartition`` — each partition is the
chunk; Spark's task scheduling replaces the islice(10_000) driver loop. The
index client is a pluggable factory so the same sink body works against any
document index; tests use the bundled JSONL-directory writer. At scale,
partition count = push parallelism; repartition upstream to match the index
cluster's ingest capacity.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable, Iterable

from pyspark.sql import DataFrame


def index_documents(
    df: DataFrame,
    writer_factory: Callable[[], Callable[[list[dict]], None]],
    batch_size: int = 10_000,
    filterable: list[str] | None = None,
) -> None:
    """Push every row of ``df`` to a search index in ≤ batch_size chunks.

    ``writer_factory`` is called once per partition ON THE EXECUTOR and must
    return ``add_documents(list[dict])``; it must therefore be
    picklable-constructible (connection params, not live connections).
    ``filterable`` mirrors the facet-schema declaration — recorded by the
    writer before the first batch.
    """
    fields = df.columns

    def push(rows: Iterable) -> None:
        add_documents = writer_factory()
        if filterable:
            add_documents([{"__filterable_attributes__": filterable}])
        batch: list[dict] = []
        for row in rows:
            batch.append({f: row[f] for f in fields})
            if len(batch) >= batch_size:
                add_documents(batch)
                batch = []
        if batch:
            add_documents(batch)

    df.foreachPartition(push)


def jsonl_dir_writer(out_dir: str) -> Callable[[], Callable[[list[dict]], None]]:
    """Directory-backed fake index for tests and offline export: each batch
    becomes one JSONL file (named uniquely per partition/batch). The on-disk
    layout IS the loader input — the exact analogue of the reference's
    per-job .nq part files."""

    def factory() -> Callable[[list[dict]], None]:
        os.makedirs(out_dir, exist_ok=True)

        def add_documents(docs: list[dict]) -> None:
            path = os.path.join(out_dir, f"batch-{uuid.uuid4().hex}.jsonl")
            with open(path, "w", encoding="utf-8") as f:
                for d in docs:
                    f.write(json.dumps(d, default=str) + "\n")

        return add_documents

    return factory
