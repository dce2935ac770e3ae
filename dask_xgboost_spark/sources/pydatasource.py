"""Custom Python Data Source (PySpark 4 ``pyspark.sql.datasource`` API).

The engine's extension point for formats Spark has no native reader for
(the reference's equivalent surface is dask's pluggable ``dd.read_*``
family — core.py:301 reads CSV, but dask accepts any per-partition
reader callable). The contract that makes this scale:

- ``partitions()`` runs ONCE on the driver and returns one
  ``InputPartition`` per independently-readable unit (here: one file).
  At 100 TB that's a listing, never a read.
- ``read(partition)`` runs on EXECUTORS, one task per partition, so
  ingest parallelism tracks file count exactly like a native scan.
- The returned iterator yields plain tuples in schema order — Spark
  converts them via Arrow batches, so the Python boundary is batched,
  not per-row py4j.

A Python-side reader is the slow path versus a native scan (per-line
``json.loads`` here), so this source is for *genuinely unsupported*
formats: proprietary logs, odd binary layouts, API-backed reads. For
anything parquet/CSV/JSON-shaped, use the native readers in tables.py.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class JsonLinesDataSource(DataSource):
    """``format("pyjsonl")``: JSONL directory reader implemented in pure
    Python — the demo format for the custom-source plumbing. Options:
    ``path`` (directory of ``part-*.json`` files). Schema comes from the
    user's ``.schema(...)`` (Spark passes it through) or the default."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def schema(self) -> str:
        return self.options.get(
            "defaultschema", "doc_id bigint, lang string, text string"
        )

    def reader(self, schema) -> "JsonLinesReader":
        return JsonLinesReader(schema, self.options)


class JsonLinesReader(DataSourceReader):
    def __init__(self, schema, options):
        self._schema = schema
        self._path = options["path"]

    def partitions(self):
        # Driver-side LISTING only: one InputPartition per data file.
        # Sorted for deterministic partition numbering (not ordering
        # semantics — downstream must still sort, like any scan).
        import os

        files = sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.startswith("part-") and f.endswith(".json")
        )
        return [InputPartition(f) for f in files]

    def read(self, partition):
        # Executor-side: decode one file, yield schema-ordered tuples.
        # Absent keys surface as NULL (same contract as the native JSON
        # reader with an explicit schema).
        import json

        names = [f.name for f in self._schema.fields]
        with open(partition.value, "r", encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


_REGISTERED_APPS: set[str] = set()


def register_python_sources(spark) -> None:
    """Idempotently register the custom sources on this session."""
    app = spark.sparkContext.applicationId
    if app in _REGISTERED_APPS:
        return
    spark.dataSource.register(JsonLinesDataSource)
    _REGISTERED_APPS.add(app)
