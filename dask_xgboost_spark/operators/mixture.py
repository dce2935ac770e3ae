"""Corpus mixture / data-mixing operators (SURVEY.md §2G extensions).

Training-data pipelines end with a *mixing* step: each source (crawl,
curated, code, ...) and each language is sampled at its own rate so the
final corpus matches a target composition. These operators implement the
two canonical shapes — rate-based source mixing and exact per-language
balancing — with the same determinism discipline as Q-SAMPLE-02: keyed
md5-hash sampling, never seeded PRNGs, so the sample is reproducible
across retries, repartitioning, engines, and incremental re-runs.

Reference parity: dask/dask-xgboost has no corpus ops; these extend the
declared LLM-pipeline surface (SURVEY.md §2G) alongside operators/text.py
and operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_xgboost_spark.plans.scale import bounded_sort
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load


def _doc_hash():
    """Stable per-document sampling key: md5 hex of the doc id string.

    Identical bytes in Spark and DuckDB for the same input, and
    lexicographic compare of lowercase hex is portable — the basis of
    every hash-checkable sampling operator here.
    """
    return F.md5(F.col("doc_id").cast("string"))


@register(
    "L-MIX-01",
    # crawl-like sources (src0..src9, LENGTH = 4) are downsampled to
    # P(md5 first byte < 0x20) = 32/256 = 12.5%; curated sources
    # (src10.., LENGTH = 5) are kept in full ('g' sorts above every hex
    # digit, so the filter passes everything).
    sql="SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept, "
    "CAST(SUM(doc_id) AS BIGINT) AS id_sum, "
    "CAST(SUM(n_chars) AS BIGINT) AS chars_kept "
    "FROM documents "
    "WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < "
    "(CASE WHEN length(source) = 5 THEN 'g' ELSE '20' END) "
    "GROUP BY source ORDER BY source",
)
def l_mix_01(spark, sf):
    """Source-mixture sampling: each source is sampled at its own target
    rate (here: crawl-tier sources at 12.5%, curated-tier in full) via a
    per-document md5 threshold — the data-mixing step that sets corpus
    composition before training.

    Scale shape: a map-only filter (the rate lookup is a CASE on a
    column already in the row — for a real N-source rate table, broadcast
    a tiny source→threshold dim and join), then one map-side-combined
    rollup to witness per-source kept counts. No global state, no PRNG:
    the keep/drop decision for a document never changes when the corpus
    is repartitioned or a partition is recomputed, so incremental runs
    at 100 TB produce byte-identical mixtures.
    """
    docs = load(spark, sf, "documents")
    threshold = F.when(F.length("source") == 5, F.lit("g")).otherwise(F.lit("20"))
    return (
        docs.filter(F.substring(_doc_hash(), 1, 2) < threshold)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
        # enum grain (sources): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "source")
    )


@register(
    "L-MIX-02",
    sql="WITH ranked AS (SELECT doc_id, lang, "
    "ROW_NUMBER() OVER (PARTITION BY lang "
    "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
    "FROM documents), "
    "tgt AS (SELECT MIN(cnt) AS target FROM "
    "(SELECT COUNT(*) AS cnt FROM documents GROUP BY lang) c) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept, "
    "CAST(SUM(doc_id) AS BIGINT) AS id_sum "
    "FROM ranked, tgt WHERE rn <= target "
    "GROUP BY lang ORDER BY lang",
)
def l_mix_02(spark, sf):
    """Language-balanced exact downsample: every language keeps exactly
    `min(lang count)` documents — the head languages are cut to the tail
    language's size (uniform language mixture). Selection is the first
    `target` docs per language in md5-hash order, so which documents
    survive is a pure function of their ids: deterministic, engine- and
    partitioning-independent.

    Scale shape: one shuffle to rank within language (the per-lang
    row_number window), one 1-row broadcast for the global target, and
    a map-side-combined witness rollup. The window sort is per-language
    — at 100 TB each language partition sorts independently; for
    pathologically large single languages, swap row_number for an
    md5-threshold rate (L-MIX-01 shape) computed from the counts, which
    drops the sort entirely at the cost of ±binomial jitter in the kept
    count.
    """
    docs = load(spark, sf, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(_doc_hash(), "doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(w))
    target = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("target"))
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("target"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("lang")
    )


@register(
    "L-MIX-03",
    # quality signal = integer stopword percent (100*n_stop // n_tok:
    # integer division on both engines — no float boundary risk);
    # fluent-band docs keep 100%, low-stopword docs 50%, rest 12.5%
    sql="WITH q AS (SELECT doc_id, "
    "(100 * len(list_filter(string_split(text, ' '), w -> w IN "
    "('the', 'a', 'of', 'and', 'to'))) // len(string_split(text, ' '))) AS swp "
    "FROM documents), "
    "b AS (SELECT doc_id, swp, "
    "CASE WHEN swp >= 20 THEN 2 WHEN swp >= 5 THEN 1 ELSE 0 END AS bin, "
    "CASE WHEN swp >= 20 THEN 'g' WHEN swp >= 5 THEN '80' ELSE '20' END AS thr "
    "FROM q) "
    "SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < thr "
    "THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
    "CAST(SUM(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < thr "
    "THEN doc_id ELSE 0 END) AS BIGINT) AS id_sum_kept "
    "FROM b GROUP BY bin ORDER BY bin",
)
def l_mix_03(spark, sf):
    """Quality-stratified mixing: documents are binned by a fluency
    signal (integer stopword percent — high-stopword text reads like
    natural language) and each bin is sampled at its own md5-threshold
    rate: fluent band 100%, middle 50%, low 12.5%. This is the
    FineWeb/DCLM-style quality-weighted mixture — upweight what the
    classifier likes without hard-dropping the rest.

    Scale shape: the quality score is map-only column algebra (token
    HOFs, integer division — no UDFs), the keep decision is a map-only
    hash compare, and the witness rollup groups on a 3-value key. One
    tiny shuffle total; the full corpus streams through exactly once.
    """
    from dask_xgboost_spark.operators.text import STOPWORDS

    toks = F.split(F.col("text"), " ")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS)))
    docs = (
        load(spark, sf, "documents")
        .select("doc_id", n_stop.alias("n_stop"), F.size(toks).alias("n_tok"))
        .select("doc_id", F.expr("(100 * n_stop) div n_tok").alias("swp"))
    )
    bin_ = F.when(F.col("swp") >= 20, 2).when(F.col("swp") >= 5, 1).otherwise(0)
    thr = (
        F.when(F.col("swp") >= 20, "g").when(F.col("swp") >= 5, "80").otherwise("20")
    )
    kept = F.substring(_doc_hash(), 1, 2) < F.col("thr")
    return (
        docs.select("doc_id", bin_.alias("bin"), thr.alias("thr"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(kept.cast("long")).cast("long").alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id")).otherwise(F.lit(0)))
            .cast("long")
            .alias("id_sum_kept"),
        )
        # enum grain (3 quality bins): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "bin")
    )


@register(
    "L-MIX-04",
    # keep_l = floor(sqrt(n_l * n_min)) — IEEE-754 sqrt is correctly
    # rounded in both engines, so the double (and its floor) is
    # bit-identical; no pow()-ulp portability risk
    sql="WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang), "
    "t AS (SELECT lang, cnt, "
    " LEAST(cnt, CAST(FLOOR(SQRT(CAST(cnt AS DOUBLE) * (SELECT MIN(cnt) FROM c))) AS BIGINT)) AS keep_n "
    " FROM c), "
    "ranked AS (SELECT doc_id, lang, "
    " ROW_NUMBER() OVER (PARTITION BY lang "
    " ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn FROM documents) "
    "SELECT r.lang, CAST(COUNT(*) AS BIGINT) AS n_kept, "
    " CAST(SUM(doc_id) AS BIGINT) AS id_sum "
    "FROM ranked r JOIN t ON r.lang = t.lang WHERE r.rn <= t.keep_n "
    "GROUP BY r.lang ORDER BY r.lang",
)
def l_mix_04(spark, sf):
    """Temperature-balanced language sampling (α = 0.5): each language
    keeps ``floor(sqrt(n_l · n_min))`` documents — the geometric mean of
    its natural size and the smallest language's size. The standard
    compromise between natural sampling (head languages drown the tail)
    and uniform balancing (L-MIX-02 throws away most head-language
    data); multilingual pretraining recipes (mBERT, XLM-R) use exactly
    this exponent-damped shape. α is fixed at 0.5 because IEEE sqrt is
    correctly rounded in every engine — general pow() is not, and a
    1-ulp difference would flip a floor() and break the hash check.

    Scale shape: identical to L-MIX-02 — per-language count (tiny,
    broadcast), per-language rank window, md5-deterministic selection."""
    docs = load(spark, sf, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    min_cnt = counts.agg(F.min("cnt").alias("min_cnt"))
    targets = counts.crossJoin(F.broadcast(min_cnt)).select(
        "lang",
        F.least(
            F.col("cnt"),
            F.floor(F.sqrt(F.col("cnt").cast("double") * F.col("min_cnt"))).cast("bigint"),
        ).alias("keep_n"),
    )
    w = Window.partitionBy("lang").orderBy(_doc_hash(), "doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), "lang")
        .filter(F.col("rn") <= F.col("keep_n"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("lang")
    )


_MIX5_SQL = """
WITH src AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
    FROM documents GROUP BY source
),
budget AS (
    SELECT CAST(SUM(tokens) AS BIGINT) AS b_total,
           CAST(COUNT(*) AS BIGINT) AS n_src
    FROM src
)
SELECT source, n_docs, tokens,
       CAST(b_total // n_src AS BIGINT) AS quota,
       CAST(LEAST(4, (b_total // n_src) // tokens) AS BIGINT) AS full_epochs,
       CAST(CASE WHEN (b_total // n_src) // tokens >= 4 THEN 0
                 ELSE (b_total // n_src) % tokens END AS BIGINT)
           AS partial_tokens
FROM src, budget ORDER BY source
"""


@register("L-MIX-05", sql=_MIX5_SQL)
def l_mix_05(spark, sf):
    """Epoch-repetition schedule for data-constrained training
    (the Muennighoff et al. 2023 regime): the total token budget is
    split equally across sources, and each source fills its quota by
    FULL repeats (capped at 4 epochs — repeated data stops helping
    around there) plus a partial-epoch remainder — small curated
    sources repeat, large crawl sources truncate. All integer
    arithmetic (floor-division quotas), so the schedule is
    byte-reproducible; the partial-epoch remainder would then drive
    L-MIX-01's deterministic md5 sampling to pick WHICH tokens fill
    it.

    Scale shape: one pass for per-source token counts (map-side
    combined), a scalar budget row carried by cross join — the
    schedule itself is dimension-sized. The expensive part of mixture
    building (the actual sampling) stays map-only downstream."""
    docs = load(spark, sf, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("tokens"),
    )
    budget = src.agg(
        F.sum("tokens").cast("bigint").alias("b_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    quota = F.expr("b_total DIV n_src")  # exact int64 floor division
    epochs = F.expr("(b_total DIV n_src) DIV tokens")
    full = F.least(F.lit(4).cast("bigint"), epochs)
    partial = F.when(epochs >= 4, F.lit(0)).otherwise(
        F.expr("(b_total DIV n_src) % tokens")
    )
    return (
        src.crossJoin(F.broadcast(budget))
        .select(
            "source", "n_docs", "tokens",
            quota.alias("quota"),
            full.cast("bigint").alias("full_epochs"),
            partial.cast("bigint").alias("partial_tokens"),
        )
        .orderBy("source")
    )
