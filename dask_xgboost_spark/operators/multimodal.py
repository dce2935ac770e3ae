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


# --- perceptual-hash near-dup (L-MM-05) ----------------------------------
#
# The pixel source is the STUBBED decode (md5-chain pseudo-pixels — no
# media libs in this container; same discipline as decode_media): 7 rows
# x 9 cols of 4-bit "grayscale" values per asset. Everything downstream
# of the pixels — the dHash gradient bits, the banded LSH join, the
# Hamming verification — is the real algorithm, shared verbatim with any
# true decoder. Near-duplicates are planted at the PIXEL level (one
# pixel bumped on copies of doc_id < 40), because a byte-level text
# perturbation would scramble the fake decode entirely — with a real
# decoder, a re-encoded/resized image perturbs pixels exactly like this.

_PHASH_ROWS, _PHASH_COLS = 7, 9  # 56 gradient bits < 63 → int64-safe


def _phash_sql() -> str:
    """dHash over the pseudo-pixel grid, as engine-portable SQL (valid in
    both Spark SQL and DuckDB: md5/substr/instr/CASE/bit-shifts)."""

    def pix(i: int) -> str:
        raw = f"(instr('0123456789abcdef', substr(hx, {i + 1}, 1)) - 1)"
        if i == 1:  # the planted perturbation site
            return f"(({raw} + bump) % 16)"
        return raw

    bits = []
    for r in range(_PHASH_ROWS):
        for c in range(_PHASH_COLS - 1):
            b = r * (_PHASH_COLS - 1) + c
            bits.append(
                f"(CASE WHEN {pix(r * _PHASH_COLS + c)} > "
                f"{pix(r * _PHASH_COLS + c + 1)} THEN {1 << b} ELSE 0 END)"
            )
    return "(" + " + ".join(bits) + ")"


_PHASH_BASE = (
    "SELECT doc_id, md5(text) || md5(text || 'x') || md5(text || 'y') AS hx, "
    "0 AS bump FROM documents "
    "UNION ALL "
    "SELECT doc_id + 500000, md5(text) || md5(text || 'x') || md5(text || 'y'), 1 "
    "FROM documents WHERE doc_id < 40"
)

_HAMMING_MAX = 3  # with 4 x 14-bit bands, pigeonhole guarantees recall <= 3


@register(
    "L-MM-05",
    sql=f"WITH b AS ({_PHASH_BASE}), "
    f"h AS (SELECT doc_id, {_phash_sql()} AS dhash FROM b) "
    "SELECT a.doc_id AS d1, c.doc_id AS d2, "
    " CAST(bit_count(xor(a.dhash, c.dhash)) AS INT) AS hamming "
    "FROM h a JOIN h c ON a.doc_id < c.doc_id "
    f" AND bit_count(xor(a.dhash, c.dhash)) <= {_HAMMING_MAX} "
    "ORDER BY d1, d2",
)
def l_mm_05(spark, sf):
    """Perceptual-hash near-duplicate detection for media assets: dHash
    (horizontal-gradient bits over a decoded thumbnail) + banded LSH
    join + exact Hamming verification — the image-dedup staple
    (re-encoded / slightly-edited copies share all but a few gradient
    bits, while byte hashes see unrelated blobs).

    Scale shape: the 56-bit hash splits into 4 x 14-bit bands; assets
    equi-join on (band_index, band_value), so candidates are
    hash-bucketed — never all-pairs (the oracle IS the naive all-pairs
    theta-join; identical output proves banding recall). Pigeonhole: a
    pair within Hamming ≤ 3 differs in at most 3 of 4 bands, so at
    least one band matches exactly — banding is lossless at this
    threshold. Random 56-bit hashes collide in a band at ~2^-14, so
    candidate volume stays near-linear; a duplicate pair can match in
    several bands, hence the pair-level dedup before verification."""
    load(spark, sf, "documents").createOrReplaceTempView("documents")
    base = spark.sql(f"WITH b AS ({_PHASH_BASE}) SELECT * FROM b")
    h = base.selectExpr("doc_id", f"{_phash_sql()} AS dhash")
    bands = h.select(
        "doc_id", "dhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("k"),
                    F.expr(f"(dhash >> {14 * k}) & 16383").alias("bv"),
                )
                for k in range(4)
            ])
        ).alias("band"),
    ).select("doc_id", "dhash", F.col("band.k").alias("k"), F.col("band.bv").alias("bv"))
    a = bands.select(F.col("doc_id").alias("d1"), F.col("dhash").alias("h1"), "k", "bv")
    c = bands.select(F.col("doc_id").alias("d2"), F.col("dhash").alias("h2"), "k", "bv")
    cand = (
        a.join(c, ["k", "bv"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2", "h1", "h2")  # a pair can share several bands
        .agg(F.count(F.lit(1)).alias("_nbands"))
    )
    return (
        cand.select(
            "d1", "d2",
            F.expr("CAST(bit_count(h1 ^ h2) AS INT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _HAMMING_MAX)
        .orderBy("d1", "d2")
    )


_SHARD_BUDGET = 20000.0


@register(
    "L-MM-06",
    # every selected payload must round-trip through the byte-range
    # read: ok is COMPUTED by re-reading (shard, offset, length) and
    # comparing md5 — a seek/offset bug yields ok=false and the hash
    # check fails against the oracle's constructed TRUE
    sql="SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
    "md5(text) AS content_md5, TRUE AS ok "
    "FROM documents WHERE doc_id % 97 = 0 ORDER BY doc_id",
)
def l_mm_06(spark, sf):
    """Shard-blob packing with a byte-range manifest — the WebDataset /
    tar-index shape multimodal training loaders actually consume:
    payloads concatenate into ~20 KB shard blobs (L-MM-03's byte-budget
    assignment) while a MANIFEST table records (doc_id, shard, offset,
    length, md5); any payload is then retrievable by ONE ranged read,
    no scan, no per-payload files. The check is the real thing: a
    sampled set of manifest rows is re-read by seek(offset)+read(length)
    inside an Arrow-batched task and md5-verified against the source
    table — the oracle's constructed TRUE column fails the hash if any
    byte range is wrong.

    Scale shape: shard/offset assignment is running-window arithmetic
    (per date-partition at 100 TB, as L-MM-03 documents); blob writing
    is one task per shard appending sequentially; retrieval cost is
    O(selected payloads) ranged reads against shared storage (S3 range
    GETs in production — local files here, the addressing math is
    identical)."""
    import hashlib
    import os

    import pandas as pd

    from dask_xgboost_spark.scratch import scratch_dir
    from pyspark.sql import Window

    blob_dir = scratch_dir("mm_shard_blobs")

    docs = load(spark, sf, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nbytes = F.octet_length("payload").cast("bigint")
    assigned = docs.withColumn("n_bytes", nbytes).withColumn(
        "shard",
        F.floor((F.sum("n_bytes").over(w) - F.col("n_bytes")) / F.lit(_SHARD_BUDGET))
        .cast("bigint"),
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        path = os.path.join(blob_dir, f"shard-{shard:05d}.bin")
        rows = []
        off = 0
        with open(path, "wb") as fh:
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"])
                fh.write(payload)
                rows.append(
                    (
                        int(r["doc_id"]),
                        shard,
                        off,
                        len(payload),
                        hashlib.md5(payload).hexdigest(),
                    )
                )
                off += len(payload)
        return pd.DataFrame(
            rows, columns=["doc_id", "shard", "offset", "length", "content_md5"]
        )

    manifest = assigned.groupBy("shard").applyInPandas(
        write_shard,
        "doc_id bigint, shard bigint, offset bigint, length bigint, content_md5 string",
    )
    # materialize the manifest (and the blob side-effect) before readers
    manifest = manifest.localCheckpoint()

    sampled = manifest.filter(F.col("doc_id") % 97 == 0)

    def ranged_read(iterator):
        for pdf in iterator:
            oks, lens = [], []
            for _, r in pdf.iterrows():
                path = os.path.join(blob_dir, f"shard-{int(r['shard']):05d}.bin")
                with open(path, "rb") as fh:
                    fh.seek(int(r["offset"]))
                    payload = fh.read(int(r["length"]))
                oks.append(hashlib.md5(payload).hexdigest() == r["content_md5"])
                lens.append(len(payload))
            out = pdf[["doc_id", "content_md5"]].copy()
            out["n_bytes"] = lens
            out["ok"] = oks
            yield out[["doc_id", "n_bytes", "content_md5", "ok"]]

    return (
        sampled.mapInPandas(
            ranged_read, "doc_id bigint, n_bytes bigint, content_md5 string, ok boolean"
        )
        .orderBy("doc_id")
    )
