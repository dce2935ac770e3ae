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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


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

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        return JsonLinesWriter(schema, self.options, overwrite)


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

        # an empty directory yields zero InputPartitions, and Spark then
        # invokes read() once with None — a scan of nothing must return
        # nothing, not crash (found by the all-or-nothing writer test)
        if partition is None:
            return

        names = [f.name for f in self._schema.fields]
        with open(partition.value, "r", encoding="utf-8") as fh:
            for line in fh:
                if not line.strip():
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class RangeStreamDataSource(DataSource):
    """``format("pyrangestream")``: a custom STREAMING source in pure
    Python (``DataSourceStreamReader``) emitting a deterministic integer
    sequence — batch *i* delivers values ``[i·rowsPerBatch,
    (i+1)·rowsPerBatch)``, capped at ``maxRows``. The micro-batch
    contract this demonstrates:

    - ``latestOffset`` (driver) advances the high-watermark one batch at
      a time until the cap — the source decides batch sizing, Spark
      decides scheduling.
    - ``partitions(start, end)`` (driver) splits the offset range into
      ``numPartitions`` independent slices — executor parallelism within
      a micro-batch.
    - ``read(partition)`` (executor) yields the slice's rows.
    - Offsets are JSON dicts checkpointed by Spark; after a restart the
      stream resumes from the committed offset, so exactly-once flows
      from offset replay + idempotent sink (same as Kafka sources).

    Options: ``rowsPerBatch``, ``maxRows``, ``numPartitions``, and
    optional ``stateDir`` — when set, the reader persists its
    high-watermark to a sidecar file so a RESTARTED query (new reader
    instance, same checkpoint) resumes advancing from where it left off
    instead of re-emitting a watermark behind the committed offset.
    Restart-resume is proven in tests/test_golden.py."""

    @classmethod
    def name(cls) -> str:
        return "pyrangestream"

    def schema(self) -> str:
        return "value bigint"

    def streamReader(self, schema) -> "RangeStreamReader":
        return RangeStreamReader(self.options)


class RangeStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        # Spark lower-cases reader option keys.
        self._rows_per_batch = int(options.get("rowsperbatch", 100))
        self._max_rows = int(options.get("maxrows", 1000))
        self._num_partitions = int(options.get("numpartitions", 4))
        self._state_dir = options.get("statedir")

    def _load_hwm(self) -> int:
        if self._state_dir:
            import os

            path = os.path.join(self._state_dir, "hwm")
            if os.path.exists(path):
                with open(path) as fh:
                    return int(fh.read().strip() or 0)
        return getattr(self, "_hwm", 0)

    def _store_hwm(self, hwm: int) -> None:
        self._hwm = hwm
        if self._state_dir:
            import os

            os.makedirs(self._state_dir, exist_ok=True)
            tmp = os.path.join(self._state_dir, "hwm.tmp")
            with open(tmp, "w") as fh:
                fh.write(str(hwm))
            os.replace(tmp, os.path.join(self._state_dir, "hwm"))

    def initialOffset(self):
        return {"offset": 0}

    def latestOffset(self):
        # Monotone high-watermark: one batch-worth per call, capped.
        # With stateDir the watermark survives reader re-instantiation
        # (query restart); without it, a restarted reader would poll
        # watermarks behind the committed offset until it caught up.
        cur = self._load_hwm()
        self._store_hwm(min(cur + self._rows_per_batch, self._max_rows))
        return {"offset": self._hwm}

    def partitions(self, start, end):
        lo, hi = start["offset"], end["offset"]
        n = max(1, self._num_partitions)
        step = max(1, (hi - lo + n - 1) // n)
        return [
            InputPartition((s, min(s + step, hi))) for s in range(lo, hi, step)
        ]

    def read(self, partition):
        lo, hi = partition.value
        for v in range(lo, hi):
            yield (v,)

    def commit(self, end):
        pass


_REGISTERED_APPS: set[str] = set()


def register_python_sources(spark) -> None:
    """Idempotently register the custom sources on this session."""
    app = spark.sparkContext.applicationId
    if app in _REGISTERED_APPS:
        return
    spark.dataSource.register(JsonLinesDataSource)
    spark.dataSource.register(RangeStreamDataSource)
    _REGISTERED_APPS.add(app)


class JsonLinesWriter(DataSourceWriter):
    """Batch WRITER for the ``pyjsonl`` source (Spark 4
    ``DataSourceWriter``) — completing the extension point's third leg
    (batch read / stream read / batch write). Transactional contract,
    the same WAP discipline as G-AUDIT-01:

    - each task writes its rows to a ``.staged`` file and returns the
      path as its commit message (never visible to the reader, which
      matches only ``part-*.json``);
    - ``commit()`` runs on the driver ONLY if every task succeeded and
      renames all staged files into readable ``part-*.json`` names —
      speculative/retried task leftovers stay ``.staged`` and invisible;
    - ``abort()`` deletes every staged file, so a failed job publishes
      nothing.

    At 100 TB: tasks stream rows to their own file (no driver data
    path); commit is O(files) renames."""

    def __init__(self, schema, options, overwrite: bool):
        self._names = [f.name for f in schema.fields]
        self._path = options["path"]
        self._overwrite = overwrite

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self._path, exist_ok=True)
        staged = os.path.join(self._path, f"part-{uuid.uuid4().hex}.json.staged")
        n = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(self._names, row))) + "\n")
                n += 1
        return WriterCommitMessage_(staged, n)

    def commit(self, messages):
        import os

        if self._overwrite:
            for f in os.listdir(self._path):
                if f.startswith("part-") and f.endswith(".json"):
                    os.remove(os.path.join(self._path, f))
        for m in messages:
            if m is not None and m.staged_path:
                os.replace(m.staged_path, m.staged_path[: -len(".staged")])

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and m.staged_path:
                try:
                    os.remove(m.staged_path)
                except FileNotFoundError:
                    pass


class WriterCommitMessage_(WriterCommitMessage):
    """Serializable per-task commit message: the staged path + rowcount."""

    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows
