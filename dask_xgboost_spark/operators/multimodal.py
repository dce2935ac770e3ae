"""Multimodal column operators (SURVEY.md §2G L-MM-01).

Design for image/audio/video at 100 TB: media are opaque ``binary``
columns with typed metadata columns beside them; decode/feature-extract
runs as Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row objects. The decode step itself is STUBBED (no media libs in
this container) behind a deterministic fake — the Spark-side plumbing
(schema, batch shape, partition flow) is real and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load


@register(
    "L-MM-01",
    sql="SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, "
    "md5(text) AS content_md5 FROM documents ORDER BY doc_id",
)
def l_mm_01(spark, sf):
    """Binary payload column + checksum/length metadata (parquet-native
    BinaryType; the oracle checks byte length and digest parity)."""
    payload = F.encode(F.col("text"), "utf-8")
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.octet_length(payload).alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        )
        .orderBy("doc_id")
    )


# --- decode / feature-extraction plumbing (stubbed decode) ---------------

FEATURE_DIM = 8


def decode_media(payload: bytes) -> bytes:
    """Decode an image/audio payload. STUB: media codecs are not available
    in this environment; raise so callers must opt into the fake path."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use fake_features=True"
    )


def _fake_feature_batch(pdf, dim: int):
    """Deterministic fake 'embedding': byte-histogram moments of the
    payload. Stands in for a real decoder; same signature/batch shape."""
    import numpy as np

    out = []
    for payload in pdf["payload"]:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        chunks = np.array_split(arr, dim)
        out.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
    return out


def extract_features(df: DataFrame, fake_features: bool = True) -> DataFrame:
    """mapInPandas feature extraction over a binary ``payload`` column.

    Arrow-batched: each batch is a pandas DataFrame whose payload column
    holds raw bytes; output schema is (doc_id, features array<double>).
    Real decoders drop into ``_fake_feature_batch``'s slot unchanged.
    """
    if not fake_features:
        decode_media(b"")  # raises NotImplementedError

    def run(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": _fake_feature_batch(pdf, FEATURE_DIM),
                }
            )

    return df.mapInPandas(run, "doc_id bigint, features array<double>")


@register("L-MM-02", sql=None, mode="golden")
def l_mm_02(spark, sf):
    """Multimodal feature-extraction plumbing end-to-end: text→binary
    payload → mapInPandas (stub decoder) → typed feature array. Golden:
    deterministic output, schema asserted in tests."""
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    )
    feat = extract_features(docs, fake_features=True)
    return feat.select(
        "doc_id",
        F.size("features").alias("dim"),
        F.round(F.element_at("features", 1), 6).alias("f1"),
    ).orderBy("doc_id")


_MM3_SQL = """
SELECT shard, COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc
FROM (
  SELECT doc_id, n_bytes,
         CAST(FLOOR((CAST(SUM(n_bytes) OVER (ORDER BY doc_id) AS BIGINT) - n_bytes)
              / 20000.0) AS BIGINT) AS shard
  FROM (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents) t
) s GROUP BY shard ORDER BY shard
"""


@register("L-MM-03", sql=_MM3_SQL)
def l_mm_03(spark, sf):
    """Byte-budget shard packing for media decode: assign payloads to
    decode-worker shards so every shard holds ~budget bytes of
    contiguous (doc_id-ordered) media — the scheduling step before
    fanning binary columns out to GPU decoders. shard = floor(exclusive
    running byte total / budget): pure running-window arithmetic,
    deterministic in both engines. (The global ORDER BY window is the
    declared semantics; at 100 TB the same expression runs per
    date-partition so each partition packs independently.)"""
    budget = 20000.0
    from pyspark.sql import Window

    payload_bytes = F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized = load(spark, sf, "documents").select(
        "doc_id", payload_bytes.alias("n_bytes")
    )
    sharded = sized.withColumn(
        "shard",
        F.floor((F.sum("n_bytes").over(w) - F.col("n_bytes")) / budget),
    )
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard")
    )


@register(
    "L-MM-04",
    sql="SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, "
    "md5(text) AS content_md5 FROM documents WHERE doc_id < 200 "
    "ORDER BY doc_id",
)
def l_mm_04(spark, sf):
    """Raw media-directory ingestion via the ``binaryFile`` source — the
    front door for image/audio corpora that arrive as FILES, before any
    of the column-oriented ops (L-MM-01..03) apply: one distributed read
    yields (path, modificationTime, length, content) rows, the id is
    parsed from the filename JVM-side, and payload metadata (length,
    digest) is computed on the binary column without Python touching the
    bytes.

    At 100 TB this is how a crawl landing zone becomes a table: read
    once with ``pathGlobFilter``/``recursiveFileLookup``, checksum and
    size in the same pass, write parquet with the payload as a binary
    column — after which decode fan-out is L-MM-03's problem. (The
    fixture writes 200 files from documents.text so the oracle can
    verify the SAME digests from the table side; the write loop is test
    scaffolding, the ingestion is the distributed part.)"""
    import os
    import shutil
    import tempfile

    # per-SF dir, wiped first: a rerun or an SF switch must never leave
    # stale files for the glob to pick up
    base = os.path.join(
        tempfile.gettempdir(), f"dxs_mm_raw_{os.path.basename(sf.rstrip('/'))}"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    rows = (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:  # bounded fixture scaffolding (200 files), not the op
        with open(os.path.join(base, f"doc_{r['doc_id']:08d}.bin"), "wb") as fh:
            fh.write(r["text"].encode("utf-8"))
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(base)
    )
    return (
        raw.select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("length").cast("int").alias("n_bytes"),
            F.md5(F.col("content")).alias("content_md5"),
        )
        .orderBy("doc_id")
    )
