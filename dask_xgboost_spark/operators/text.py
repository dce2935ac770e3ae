"""Text-analysis operators for training-data pipelines (SURVEY.md §2G).

Language-ID, quality scoring, token statistics, n-grams, TF-IDF and
document fingerprinting over the ``documents`` table. Everything is
pure column algebra (whole-stage codegen, no UDFs) and hash-checked
against DuckDB — including TF-IDF, whose exact integer TF/DF core is
oracle-pinned (L-TEXT-04; the float IDF weighting is post-arithmetic,
cross-checked against MLlib in tests/test_golden.py).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_xgboost_spark.caching import persist_rollup
from dask_xgboost_spark.plans.scale import bounded_sort
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.scratch import scratch_dir
from dask_xgboost_spark.sources import load

# Explicit stopword list — mirrored literally in the oracle SQL (never
# depend on MLlib's default list for checkable semantics).
STOPWORDS = ["the", "a", "of", "and", "to"]
_SW = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "L-TEXT-01",
    sql="SELECT doc_id, CAST(len(toks) AS INT) AS n_tok, "
    f"CAST(len(list_filter(toks, w -> w NOT IN ({_SW}))) AS INT) AS n_content "
    "FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) t "
    "ORDER BY doc_id",
)
def l_text_01(spark, sf):
    """Tokenize + stopword removal (declarative twin of RegexTokenizer +
    StopWordsRemover; expressed as HOFs so it hash-checks and stays JVM-side)."""
    toks = F.split(F.lower("text"), " ")
    content = F.filter(toks, lambda w: ~w.isin(STOPWORDS))
    return (
        load(spark, sf, "documents")
        .select("doc_id", F.size(toks).alias("n_tok"), F.size(content).alias("n_content"))
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-02",
    sql="SELECT doc_id, CAST(len(bgs) AS INT) AS n_bigrams, "
    "CAST(len(list_distinct(bgs)) AS INT) AS n_distinct_bigrams FROM ("
    "SELECT doc_id, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bgs "
    "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x) y "
    "ORDER BY doc_id",
)
def l_text_02(spark, sf):
    """Word bigrams via HOFs (declarative twin of MLlib NGram(n=2))."""
    t = F.split(F.col("text"), " ")
    # guard: sequence(1, 0) is DESCENDING in Spark — a 1-token doc would
    # index out of bounds (DuckDB's range(1, 1) is empty and safe)
    bgs = F.expr(
        "case when size(split(text, ' ')) >= 2 then "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat_ws(' ', element_at(split(text, ' '), i), "
        "element_at(split(text, ' '), i + 1))) "
        "else array() end"
    )
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.size(bgs).alias("n_bigrams"),
            F.size(F.array_distinct(bgs)).alias("n_distinct_bigrams"),
        )
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-03",
    sql="SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM documents WHERE lang IN ('en', 'de') AND n_chars BETWEEN 100 AND 400 "
    "GROUP BY lang ORDER BY lang",
)
def l_text_03(spark, sf):
    """Language/length quality filters (the basic corpus-curation gate)."""
    return (
        load(spark, sf, "documents")
        .filter(F.col("lang").isin("en", "de") & F.col("n_chars").between(100, 400))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars"))
        # enum grain (languages): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "lang")
    )


@register(
    "L-TEXT-04",
    sql="WITH tok AS ("
    "  SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term"
    "  FROM documents), "
    "tf AS ("
    "  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok"
    "  WHERE term <> '' GROUP BY doc_id, term), "
    "dft AS ("
    "  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term) "
    "SELECT tf.doc_id, "
    "  CAST(SUM(tf) AS BIGINT) AS n_tok, "
    "  CAST(COUNT(*) AS BIGINT) AS n_terms, "
    "  CAST(MAX(tf) AS BIGINT) AS max_tf, "
    "  CAST(SUM(tf * tf) AS BIGINT) AS tf_sq_sum, "
    "  CAST(SUM(tf * df) AS BIGINT) AS df_checksum, "
    "  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs "
    "FROM tf JOIN dft ON tf.term = dft.term "
    "GROUP BY tf.doc_id ORDER BY doc_id",
)
def l_text_04(spark, sf):
    """TF-IDF, hash-mode (upgraded golden→hash r11, the M-PREP-01 /
    sketch-trio move applied to the text tier): exact-vocabulary term
    frequencies and document frequencies — the EXACT INTEGER CORE that
    TF-IDF consumes — materialized per doc and oracle-pinned to the
    row: total tokens, distinct terms, max TF, Σtf² (the raw-count
    norm² carrier), a DF-weighted checksum Σ tf·df coupling every
    doc's TF vector to the corpus-wide DF table (any single df
    diverging anywhere in the vocabulary fails some doc's hash), and
    the corpus size N. The float IDF weighting ln((N+1)/(df+1))+1 is
    pure post-arithmetic on these carriers; tests/test_golden.py
    closes that loop by fitting MLlib CountVectorizer+IDF on the same
    tokens and asserting its per-term docFreq equals the dft table
    here (so the pinned core is literally what MLlib's TF-IDF
    consumes). The old HashingTF path is unpinnable by nature
    (murmur3 bucketing is engine-specific) and added nothing but
    collisions at this vocabulary size.

    Scale shape: tf is one map-combined groupBy at (doc, term) grain;
    dft reuses tf's output at term grain; the tf⋈dft join shuffles
    both sides on term (vocabulary co-partitioning — the canonical
    distributed TF-IDF shape); the corpus-size aggregate is a single
    broadcast row (BNLJ_SCALAR-safe). Nothing touches the driver."""
    tok = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = (
        load(spark, sf, "documents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    return (
        tf.join(dft, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tok"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.max("tf").cast("bigint").alias("max_tf"),
            F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("tf_sq_sum"),
            F.sum(F.col("tf") * F.col("df")).cast("bigint").alias("df_checksum"),
        )
        .crossJoin(F.broadcast(n))
        .orderBy("doc_id")
    )


# Marker-word lists for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ["the", "value", "fast", "table"],
    "de": ["data", "row", "slow"],
    "es": ["key", "part", "hash"],
}


def _lang_sql() -> str:
    scores = ", ".join(
        "CAST(len(list_filter(toks, w -> w IN ({words}))) AS INT) AS s_{lang}".format(
            words=", ".join(f"'{w}'" for w in ws), lang=lang
        )
        for lang, ws in LANG_MARKERS.items()
    )
    return (
        "SELECT doc_id, s_en, s_de, s_es, "
        "CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en' "
        "WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang FROM ("
        f"SELECT doc_id, {scores} FROM "
        "(SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) t) s "
        "ORDER BY doc_id"
    )


@register("L-TEXT-05", sql=_lang_sql())
def l_text_05(spark, sf):
    """Language-ID heuristic: marker-word overlap scores + deterministic
    argmax. (Fixture text is a synthetic shared-vocabulary soup, so this
    demonstrates the operator shape, not linguistic accuracy.)"""
    toks = F.split(F.lower("text"), " ")
    d = load(spark, sf, "documents").select(
        "doc_id",
        *[
            F.size(F.filter(toks, lambda w: w.isin(ws))).alias(f"s_{lang}")
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    pred = (
        F.when((F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_es")), "en")
        .when(F.col("s_de") >= F.col("s_es"), "de")
        .otherwise("es")
    )
    return d.withColumn("pred_lang", pred).orderBy("doc_id")


@register(
    "L-TEXT-06",
    sql="SELECT doc_id, "
    "CAST(len(toks) AS INT) AS n_tok, "
    "CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE) / len(toks) AS avg_tok_len, "
    f"CAST(len(list_filter(toks, w -> w IN ({_SW}))) AS DOUBLE) / len(toks) AS stopword_ratio, "
    "CAST(n_chars AS DOUBLE) / len(toks) AS chars_per_tok "
    "FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS toks FROM documents) t "
    "ORDER BY doc_id",
)
def l_text_06(spark, sf):
    """Quality scoring: token count, avg token length, stopword ratio,
    chars-per-token — exact int arithmetic → identical double ratios."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    sum_len = F.expr(
        "aggregate(transform(split(text, ' '), w -> length(w)), 0, (a, v) -> a + v)"
    )
    n_stop = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS)))
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            n_tok.alias("n_tok"),
            (sum_len.cast("double") / n_tok).alias("avg_tok_len"),
            (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
            (F.col("n_chars").cast("double") / n_tok).alias("chars_per_tok"),
        )
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-07",
    sql=r"SELECT doc_id, CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_ws_tok, "
    r"CAST(len(string_split_regex(text, '[aeiou]+')) - 1 AS INT) AS n_vowel_runs "
    "FROM documents ORDER BY doc_id",
)
def l_text_07(spark, sf):
    """Regex token counting (whitespace + a BPE-ish vowel-run split) —
    patterns kept in the Java∩RE2 common subset."""
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), r"\s+")).alias("n_ws_tok"),
            (F.size(F.split(F.col("text"), "[aeiou]+")) - 1).alias("n_vowel_runs"),
        )
        .orderBy("doc_id")
    )


_PIPE_SQL = (
    "WITH kept AS ("
    "  SELECT doc_id, lang, string_split(text, ' ') AS toks, n_chars FROM documents"
    "  WHERE lang IN ('en', 'de', 'es') AND n_chars BETWEEN 50 AND 450"
    "), scored AS ("
    "  SELECT doc_id, lang, CAST(len(toks) AS INT) AS n_tok, "
    f"  CAST(len(list_filter(toks, w -> w IN ({_SW}))) AS DOUBLE) / len(toks) AS stop_ratio "
    "  FROM kept"
    "), good AS ("
    "  SELECT * FROM scored WHERE n_tok >= 20 AND stop_ratio < 0.5"
    ") SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_toks "
    "FROM good GROUP BY lang ORDER BY lang"
)


@register("L-PIPE-01", sql=_PIPE_SQL)
def l_pipe_01(spark, sf):
    """End-to-end corpus-curation pipeline in ONE declarative plan:
    language/length gate → tokenize → quality score (stopword ratio) →
    threshold → per-language corpus stats. Single scan, one shuffle (the
    final groupBy); every stage is a column expression, so the whole
    pipeline runs inside codegen — the shape a 100 TB curation job wants."""
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    stop_ratio = F.size(F.filter(toks, lambda w: w.isin(STOPWORDS))).cast(
        "double"
    ) / n_tok
    return (
        load(spark, sf, "documents")
        .filter(F.col("lang").isin("en", "de", "es") & F.col("n_chars").between(50, 450))
        .select("doc_id", "lang", n_tok.alias("n_tok"), stop_ratio.alias("stop_ratio"))
        .filter((F.col("n_tok") >= 20) & (F.col("stop_ratio") < 0.5))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_toks"))
        # enum grain (languages): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "lang")
    )


@register(
    "L-TEXT-08",
    sql="SELECT doc_id, CAST(list_sum(list_transform(range(1, len(t) + 1), "
    "i -> CAST(i AS BIGINT) * (CAST(length(t[i]) AS BIGINT) * 31 + ascii(t[i])))) AS BIGINT) AS fp "
    "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x ORDER BY doc_id",
)
def l_text_08(spark, sf):
    """Positional rolling fingerprint: Σ (pos+1)·(31·len(tok) + first-char
    code) — a deterministic polynomial document fingerprint in pure column
    algebra (exact integer math, hash-checkable cross-engine)."""
    fp = F.expr(
        "aggregate(transform(split(text, ' '), (w, i) -> "
        "CAST(i + 1 AS BIGINT) * (CAST(length(w) AS BIGINT) * 31 + ascii(w))), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return load(spark, sf, "documents").select("doc_id", fp.alias("fp")).orderBy("doc_id")


_PIPE2_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_toks
FROM documents WHERE lang IN ('en', 'de', 'es')
GROUP BY lang ORDER BY lang
"""


@register("L-PIPE-02", sql=_PIPE2_SQL)
def l_pipe_02(spark, sf):
    """Sharded JSONL export round-trip — the interchange format of LLM
    training-data pipelines. Curated docs are written as lang-partitioned
    JSONL with bounded shard sizes (``partitionBy`` gives
    one-directory-per-language layout for downstream partition pruning;
    ``maxRecordsPerFile`` bounds shard size so a 100 TB export yields
    uniformly-sized files instead of one file per task), then re-read
    with an explicit schema and re-aggregated. Matching the oracle's
    counts, id checksum, and token totals computed from the ORIGINAL
    table proves content fidelity through the JSON encode/decode."""
    out_dir = scratch_dir("jsonl_shard")
    docs = load(spark, sf, "documents").filter(F.col("lang").isin("en", "de", "es"))
    (
        docs.select("doc_id", "lang", "text")
        .repartition("lang")
        .write.partitionBy("lang")
        .option("maxRecordsPerFile", 500)
        .mode("overwrite")
        .json(out_dir)
    )
    back = spark.read.schema("doc_id bigint, text string, lang string").json(out_dir)
    result = (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum(F.size(F.split("text", " "))).alias("total_toks"),
        )
        .orderBy("lang")
        # materialized so the round-trip read happens NOW; the export
        # dir is NOT eagerly removed — localCheckpoint blocks are
        # non-reliable (an executor loss would recompute lineage from
        # the deleted files); scratch_dir wipes it on the next call
        .localCheckpoint()
    )
    return result


@register(
    "L-TEXT-09",
    sql="SELECT w, COUNT(*) AS n FROM ("
    "SELECT unnest(string_split(text, ' ')) AS w FROM documents) t "
    "GROUP BY w ORDER BY n DESC, w LIMIT 20",
)
def l_text_09(spark, sf):
    """Corpus heavy hitters: exact token frequency top-k (vocabulary
    skew / stopword discovery — the stats that pick rare-token-blocking
    thresholds for L-DEDUP-03). explode → count → TakeOrderedAndProject:
    partial top-k per partition, k-row driver merge — never a global
    sort. At 100 TB the same query runs unchanged; for sub-pass latency
    use approx_count_distinct/count_min sketches instead."""
    return (
        load(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(20)
    )


@register(
    "L-TEXT-10",
    sql="SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok, "
    "CAST(FLOOR(-SUM((CAST(c AS DOUBLE) / t) * LN(CAST(c AS DOUBLE) / t)) * 1e6) AS BIGINT) "
    "AS ent6 FROM ("
    "  SELECT doc_id, c, CAST(SUM(c) OVER (PARTITION BY doc_id) AS DOUBLE) AS t FROM ("
    "    SELECT doc_id, w, COUNT(*) AS c FROM ("
    "      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) x "
    "    GROUP BY doc_id, w) y"
    ") z GROUP BY doc_id ORDER BY doc_id",
)
def l_text_10(spark, sf):
    """Token-distribution entropy per document — the repetition /
    boilerplate quality signal (low entropy = degenerate or
    machine-looped text; used alongside the length/stopword gates of
    L-TEXT-06). -Σ p·ln(p) over per-doc token frequencies; anchored to
    int64 micro-nats (engine ln implementations differ by 1 ulp, so raw
    doubles would not hash). Two shuffles, both on doc_id."""
    from pyspark.sql import Window

    tok = load(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    counts = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    t = F.sum("c").over(Window.partitionBy("doc_id")).cast("double")
    p = F.col("c").cast("double") / F.col("t")
    return (
        counts.withColumn("t", t)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.floor(-F.sum((F.col("c") / F.col("t")) * F.log(F.col("c") / F.col("t"))) * 1e6).alias("ent6"),
        )
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-11",
    # PII is synthesized deterministically in-query (the fixture corpus
    # has none), so the redaction branch is load-bearing: every 7th doc
    # gains an email, every 11th a phone number.
    sql="SELECT doc_id, "
    "regexp_replace(regexp_replace(pii, '[a-z0-9]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'), "
    "'555-[0-9]{4}', '<PHONE>', 'g') AS clean, "
    "CAST(len(regexp_extract_all(pii, '[a-z0-9]+@[a-z]+\\.[a-z]+')) "
    "+ len(regexp_extract_all(pii, '555-[0-9]{4}')) AS BIGINT) AS n_pii "
    "FROM (SELECT doc_id, text "
    "|| CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id || '@example.com' ELSE '' END "
    "|| CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END "
    "AS pii FROM documents) t ORDER BY doc_id",
)
def l_text_11(spark, sf):
    """PII redaction — the scrub step every training-data pipeline runs
    before a corpus ships: emails and phone numbers are replaced with
    typed placeholders and counted. Pure regexp_replace/regexp_count
    column algebra (whole-stage codegen, no UDFs; the patterns are kept
    inside the RE2∩Java-regex common dialect so the DuckDB oracle runs
    the same text). At 100 TB this is a map-only pass — no shuffle."""
    email = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    phone = r"555-[0-9]{4}"
    pii = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    return (
        load(spark, sf, "documents")
        .select("doc_id", pii.alias("pii"))
        .select(
            "doc_id",
            F.regexp_replace(
                F.regexp_replace("pii", email, "<EMAIL>"), phone, "<PHONE>"
            ).alias("clean"),
            (F.regexp_count("pii", F.lit(email)) + F.regexp_count("pii", F.lit(phone)))
            .cast("long")
            .alias("n_pii"),
        )
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-12",
    sql="SELECT doc_id, CAST(len(t) AS BIGINT) AS n_in, "
    "CAST(len(kept) AS BIGINT) AS n_out, array_to_string(kept, ' ') AS clean FROM ("
    "SELECT doc_id, t, list_filter(list_transform(range(1, len(t) + 1), "
    "i -> CASE WHEN i = 1 OR t[i] != t[i-1] THEN t[i] ELSE NULL END), "
    "v -> v IS NOT NULL) AS kept "
    "FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x) y "
    "ORDER BY doc_id",
)
def l_text_12(spark, sf):
    """Consecutive-repetition removal (run-length squeeze over tokens) —
    the within-document half of repetition cleanup (cf. Gopher/RefinedWeb
    repetition filters): stuttered tokens from scraped or machine-looped
    text collapse to one. Index-aware array HOF (filter with (x, i)
    lambda), fully JVM-side, map-only — no shuffle at any scale."""
    t = F.split(F.col("text"), " ")
    kept = F.filter(
        t, lambda x, i: (i == 0) | (x != F.element_at(t, i))
    )  # element_at is 1-based: index i (0-based lambda) = previous token
    return (
        load(spark, sf, "documents")
        .select("doc_id", t.alias("t"), kept.alias("kept"))
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_in"),
            F.size("kept").cast("long").alias("n_out"),
            F.concat_ws(" ", "kept").alias("clean"),
        )
        .orderBy("doc_id")
    )


@register(
    "L-PIPE-03",
    sql="SELECT lang, seq, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_tok) AS BIGINT) AS n_tokens, "
    "CAST(MIN(doc_id) AS BIGINT) AS first_doc, "
    "CAST(MAX(doc_id) AS BIGINT) AS last_doc FROM ("
    "SELECT lang, doc_id, n_tok, "
    "CAST(FLOOR((SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id "
    "ROWS UNBOUNDED PRECEDING) - n_tok) / 512.0) AS BIGINT) AS seq FROM ("
    "SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok "
    "FROM documents) t) s "
    "GROUP BY lang, seq ORDER BY lang, seq",
)
def l_pipe_03(spark, sf):
    """Token-budget sequence packing — the LLM-pretraining step that
    packs documents into fixed-size context windows (budget 512 tokens
    here): within each language stream, documents fill sequences in
    deterministic doc_id order; seq = floor(exclusive running token
    total / budget). Unlike L-MM-03's declared global order, the window
    is PARTITIONED (per lang), which is the 100 TB shape: one shuffle on
    the partition key and each stream packs independently — no global
    sort anywhere. Output: per-sequence manifest (doc count, token
    fill, doc range) a loader can consume directly."""
    from pyspark.sql import Window

    budget = 512.0
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = load(spark, sf, "documents").select(
        "lang", "doc_id", n_tok.alias("n_tok")
    )
    seq = F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / budget).cast("long")
    return (
        toks.withColumn("seq", seq)
        .groupBy("lang", "seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
        .orderBy("lang", "seq")
    )


@register(
    "L-TEXT-13",
    sql="WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
    "FROM documents), "
    "dfreq AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w), "
    "n AS (SELECT COUNT(*) AS nt FROM tok), "
    "j AS (SELECT t.doc_id, "
    "length(printf('%b', (SELECT nt FROM n))) - length(printf('%b', d.df)) AS ib "
    "FROM tok t JOIN dfreq d USING (w)) "
    "SELECT doc_id, COUNT(*) AS n_tok, CAST(SUM(ib) AS BIGINT) AS sum_ib, "
    "CAST(SUM(ib) AS DOUBLE) / COUNT(*) AS mean_ib "
    "FROM j GROUP BY doc_id ORDER BY doc_id",
)
def l_text_13(spark, sf):
    """Unigram-LM quality score (perplexity proxy): per-token *integer
    surprisal* ib = bitlen(N) − bitlen(df(w)) ≈ log2(N/df) — a corpus-
    trained language model score with no transcendentals, so it is
    hash-exact across engines (ln/log2 of doubles are not; bit lengths
    of int64 counts are). High mean surprisal = the doc's tokens are
    corpus-rare — the standard "looks like noise" curation signal;
    low = stopword soup.

    Scale shape: one shuffle to count the vocabulary (map-side combined),
    then the df table joins back to the token stream — broadcast when the
    vocabulary is small (fixture; most corpora ~10M tokens ≈ 100s of MB,
    still broadcastable), shuffle-hash otherwise; the doc-level rollup
    reuses the token stream's partitioning. The corpus total N is a
    1-row broadcast."""
    toks = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    )
    dfreq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    total = toks.agg(F.count(F.lit(1)).alias("nt"))

    def bitlen(c):
        return F.length(F.conv(c.cast("string"), 10, 2))

    j = (
        toks.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(total))
        .select("doc_id", (bitlen(F.col("nt")) - bitlen(F.col("df"))).alias("ib"))
    )
    return (
        j.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("ib").cast("long").alias("sum_ib"),
            (F.sum("ib") / F.count(F.lit(1))).alias("mean_ib"),
        )
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-14",
    # bucket = bit length of n_chars = floor(log2) + 1, computed in
    # INTEGER space (binary-string length) on both engines — float LOG2
    # at exact powers of two is a cross-engine hash hazard
    sql="SELECT CAST(length(printf('%b', n_chars)) AS BIGINT) AS len_bucket, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
    "CAST(MAX(n_chars) AS BIGINT) AS max_chars, "
    "CAST(SUM(n_chars) AS BIGINT) AS sum_chars "
    "FROM documents GROUP BY len_bucket ORDER BY len_bucket",
)
def l_text_14(spark, sf):
    """Document-length histogram on power-of-two buckets — the
    sequence-length profile that sizes context-window packing
    (L-PIPE-03) and flags truncation risk before training. Bucket id is
    the integer bit length of n_chars (floor(log2)+1), computed via
    binary-string length so both engines bucket identically at exact
    powers of two.

    Scale shape: map-only bucket assignment + one map-side-combined
    rollup over ~64 possible buckets — the cheapest possible shuffle
    (tiny key cardinality), trivially 100 TB-safe."""
    docs = load(spark, sf, "documents")
    bucket = F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)).cast("long")
    return (
        docs.groupBy(bucket.alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        # bounded grain (bit-length buckets <= 64): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "len_bucket")
    )


@register(
    "L-TEXT-15",
    sql="WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents), "
    "g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g "
    "FROM w, UNNEST(range(1, len(w) - 6)) AS t(i) WHERE len(w) >= 8), "
    "c AS (SELECT g, COUNT(*) AS cnt FROM g GROUP BY g) "
    "SELECT g.doc_id, "
    "CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams, "
    "CAST(COUNT(*) AS BIGINT) AS tot_grams "
    "FROM g JOIN c USING (g) GROUP BY g.doc_id ORDER BY doc_id",
)
def l_text_15(spark, sf):
    """Duplicate n-gram fraction (Lee et al. \"Deduplicating Training Data
    Makes Language Models Better\"; Gopher's dup-span quality rule): for
    each document, how many of its 8-gram instances occur more than once
    in the corpus. Emitted as exact int64 (dup, total) counts — the
    fraction is a trivial downstream division and floats never enter the
    hash. The planted exact/near duplicates in the fixture make the
    counts load-bearing (2101/23665 instances at sf0.01).

    Scale shape: explode to ~|tokens| 8-gram rows, one map-side-combined
    groupBy(g) for global counts, one shuffle join back on g, one
    groupBy(doc_id) rollup. At 100 TB, replace the raw-string gram key
    with xxhash64(g) BEFORE the shuffle (8-byte keys, not ~50-byte
    strings) — kept as the readable form here because the oracle must
    hash identical keys; guard hot grams (boilerplate) with a
    max-document-frequency cut as in L-DEDUP-03."""
    docs = load(spark, sf, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    grams = (
        docs.filter(F.size("w") >= 8)  # sequence(1, 0) is DESCENDING in Spark
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 7),"
                    " i -> array_join(slice(w, i, 8), ' '))"
                )
            ).alias("g"),
        )
    )
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        grams.join(counts, "g")
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dup_grams"),
            F.count(F.lit(1)).cast("long").alias("tot_grams"),
        )
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-16",
    sql="WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS t "
    "FROM documents), "
    "cnt AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY source, t) "
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab, "
    "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax, "
    "CAST(SUM(c) AS BIGINT) AS tokens "
    "FROM cnt GROUP BY source ORDER BY source",
)
def l_text_16(spark, sf):
    """Per-source vocabulary statistics: vocabulary size, hapax-legomena
    count (tokens occurring once — the Zipf tail), and total token count.
    vocab/tokens (type-token ratio) and hapax/vocab are the standard
    corpus-diversity profile read before mixing sources (L-MIX-01); a
    crawl slice whose TTR collapses is boilerplate-heavy. Emitted as
    exact int64 counts; ratios are downstream divisions.

    Scale shape: explode → two cascaded map-side-combined aggregates
    (token counts, then per-source rollup). The (source, token) key space
    is vocabulary-sized, not corpus-sized, after the first combine —
    this is the classic wordcount shape that scales linearly."""
    tok = load(spark, sf, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("t")
    )
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.sum("c").cast("long").alias("tokens"),
        )
        # enum grain (sources): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "source")
    )


@register(
    "L-PIPE-04",
    sql="SELECT doc_id, n_chars, source FROM documents "
    "WHERE doc_id % 3 <> 0 AND n_chars >= 100 ORDER BY doc_id",
)
def l_pipe_04(spark, sf):
    """Incremental corpus processing: a processed-ledger ANTI JOIN gates
    the expensive pipeline to ONLY new documents — the production
    alternative to reprocessing 100 TB nightly. The ledger here is the
    simulated prior run (doc_id % 3 == 0 already processed); unprocessed
    docs flow through the quality gate. In production the ledger is the
    output table's key column — reading keys costs one column scan of
    the (columnar) output, and the anti join is broadcast when the daily
    increment is small relative to the corpus.

    Scale shape: ledger anti join (broadcast or shuffled on doc_id) +
    map-only gate; total work tracks the INCREMENT size, not corpus
    size. Pair with Q-MERGE-01 to append results transactionally."""
    docs = load(spark, sf, "documents")
    ledger = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    fresh = docs.join(ledger, "doc_id", "left_anti")
    return (
        fresh.filter(F.col("n_chars") >= 100)
        .select("doc_id", "n_chars", "source")
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-17",
    sql="WITH u AS (SELECT doc_id, "
    "'https://' || lang || '.example.com/docs/' || doc_id "
    "|| '?ref=' || source AS url FROM documents) "
    "SELECT doc_id, url, "
    "regexp_extract(url, '^https?://([^/]+)', 1) AS host, "
    "regexp_extract(url, '^https?://[^/]+(/[^?#]*)', 1) AS path, "
    "regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref "
    "FROM u WHERE regexp_extract(url, '^https?://([^/]+)', 1) "
    "NOT LIKE 'zh.%' ORDER BY doc_id",
)
def l_text_17(spark, sf):
    """URL parsing + domain filtering — the crawl-pipeline gate that
    runs before any content processing: extract host/path/query
    components and drop blocklisted domains. Spark side uses the
    dedicated ``parse_url`` expression (single parse, per-part
    extraction); the oracle states the equivalent regex decomposition.
    URLs are synthesized from fixture columns so the check is
    deterministic at every SF.

    Scale shape: map-only JVM expressions; a real blocklist joins
    broadcast (domain lists are KB-MB) — never a regex-per-blocked-
    domain scan."""
    u = load(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("lang"),
            F.lit(".example.com/docs/"),
            F.col("doc_id"),
            F.lit("?ref="),
            F.col("source"),
        ).alias("url"),
    )
    host = F.parse_url("url", F.lit("HOST"))
    return (
        u.select(
            "doc_id",
            "url",
            host.alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
        )
        .filter(~F.col("host").startswith("zh."))
        .orderBy("doc_id")
    )


@register(
    "L-TEXT-18",
    sql="WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
    "FROM documents), "
    "n AS (SELECT doc_id, toks, len(toks) AS nt FROM t), "
    "c AS (SELECT doc_id, nt, "
    "unnest(generate_series(0, CAST(GREATEST(CEIL((nt - 32) / 24.0), 0) AS INT))) AS ci, "
    "toks FROM n) "
    "SELECT doc_id, CAST(ci AS INT) AS chunk_id, "
    "array_to_string(list_slice(toks, ci * 24 + 1, ci * 24 + 32), ' ') AS chunk, "
    "CAST(LEAST(nt - ci * 24, 32) AS INT) AS chunk_len "
    "FROM c ORDER BY doc_id, chunk_id",
)
def l_text_18(spark, sf):
    """Overlapping token chunking (window 32, stride 24 → 8-token
    overlap) — the RAG / context-window prep step: every document is
    split into fixed-size chunks whose overlap preserves cross-boundary
    context. Chunk COUNT comes from arithmetic on the token count, the
    chunks themselves from ``slice`` over the token array inside a
    ``transform`` HOF — one explode, no self-join, no Python.

    Scale shape: map-only until the final explode; output size is
    input size × ~(window/stride) ≈ 1.33× here, linear and predictable.
    At 100 TB pair with L-PIPE-03 (sequence packing) downstream."""
    W, S = 32, 24
    toks = F.split("text", " ")
    n_chunks = F.greatest(
        F.ceil((F.size(toks) - F.lit(W)) / F.lit(float(S))), F.lit(0)
    ).cast("int") + F.lit(1)
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda ci: F.struct(
            ci.alias("ci"),
            F.array_join(F.slice(toks, ci * S + 1, W), " ").alias("chunk"),
            F.least(F.size(toks) - ci * S, F.lit(W)).alias("chunk_len"),
        ),
    )
    return (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.ci").cast("int").alias("chunk_id"),
            F.col("c.chunk").alias("chunk"),
            F.col("c.chunk_len").cast("int").alias("chunk_len"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def lexical_scores(spark, sf, query_terms):
    """Integer-exact lexical relevance scores for one query token set:
    score(d) = Σ_w (bitlen(N_docs) − bitlen(df(w))) · min(tf(w,d), 3)
    over w ∈ query_terms. Shared by L-SIM-08 (single-ranker top-k) and
    L-SIM-09 (rank fusion). The query-term filter runs BEFORE the tf
    aggregate, so only matching postings shuffle. The document-frequency
    statistics (one row per vocab term — bounded) are persisted: they ARE
    the index in IR terms, built once per corpus and reused by every
    query and by both of L-SIM-09's retriever legs (CacheManager dedupes
    the cache entry by canonicalized plan)."""
    toks = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    )
    dfreq = persist_rollup(
        toks.groupBy("w").agg(F.count_distinct("doc_id").alias("df"))
    )
    n_docs = load(spark, sf, "documents").agg(F.count(F.lit(1)).alias("n"))

    def bitlen(c):
        return F.length(F.conv(c.cast("string"), 10, 2))

    tf = (
        toks.filter(F.col("w").isin(list(query_terms)))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.sum(
                (bitlen(F.col("n")) - bitlen(F.col("df")))
                * F.least(F.col("tf"), F.lit(3))
            )
            .cast("long")
            .alias("score")
        )
    )


@register(
    "L-SIM-08",
    sql="WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
    "FROM documents), "
    "dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w), "
    "nd AS (SELECT COUNT(*) AS n FROM documents), "
    "tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok "
    "       WHERE w IN ('data', 'query', 'stream') GROUP BY doc_id, w), "
    "sc AS (SELECT t.doc_id, "
    "SUM((length(printf('%b', (SELECT n FROM nd))) - length(printf('%b', d.df))) "
    "    * LEAST(t.tf, 3)) AS score "
    "FROM tf t JOIN dfreq d USING (w) GROUP BY t.doc_id) "
    "SELECT doc_id, CAST(score AS BIGINT) AS score FROM sc "
    "ORDER BY score DESC, doc_id LIMIT 10",
)
def l_sim_08(spark, sf):
    """Lexical ranked retrieval (integer-exact simplified BM25): score
    docs against a query token set by Σ idf_int(w)·min(tf, 3), where
    idf_int = bitlen(N_docs) − bitlen(df(w)) ≈ log2(N/df) (L-TEXT-13's
    transcendental-free integer surprisal) and min(tf,3) is the
    saturating term-frequency component (BM25's k1 curve collapsed to a
    cap). Rare query terms dominate, repeated terms saturate — the BM25
    mechanics, in arithmetic that hash-checks exactly across engines
    (ln() cross-engine bit-identity does not exist; bit lengths of int64
    counts do). Complements L-SIM-01..07's dense/embedding retrieval
    with the lexical side of hybrid search.

    Scale shape: the query token filter is pushed BEFORE the tf
    aggregate, so only postings of query terms ever shuffle — work
    tracks matching postings, not corpus size; df/N statistics are
    dimension-sized broadcasts; top-k is TakeOrderedAndProject (no
    global sort)."""
    return (
        lexical_scores(spark, sf, ["data", "query", "stream"])
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(10)
    )


_LEX_SQL = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w "
    "FROM documents), "
    "dfreq AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY w), "
    "nd AS (SELECT COUNT(*) AS n FROM documents), "
    "tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok "
    "       WHERE w IN ({terms}) GROUP BY doc_id, w) "
    "SELECT t.doc_id, "
    "CAST(SUM((length(printf('%b', (SELECT n FROM nd))) "
    "          - length(printf('%b', d.df))) * LEAST(t.tf, 3)) AS BIGINT) AS score "
    "FROM tf t JOIN dfreq d USING (w) GROUP BY t.doc_id"
)


@register(
    "L-SIM-09",
    sql="WITH a AS (" + _LEX_SQL.format(terms="'data', 'query', 'stream'") + "), "
    "b AS (" + _LEX_SQL.format(terms="'join', 'filter', 'window'") + "), "
    "ra AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r "
    "FROM a), "
    "rb AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS r "
    "FROM b) "
    "SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id, "
    "COALESCE(1.0 / (60 + ra.r), 0) + COALESCE(1.0 / (60 + rb.r), 0) AS rrf "
    "FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id "
    "ORDER BY rrf DESC, doc_id LIMIT 10",
)
def l_sim_09(spark, sf):
    """Reciprocal-rank fusion (RRF, k=60) — the standard hybrid-search
    step that merges rankings from heterogeneous retrievers without
    score calibration: fused(d) = Σ_sources 1/(k + rank_source(d)).
    Demonstrated over two lexical rankers (different query token sets;
    in production one side is the dense/ANN ranking from L-SIM-01..07 —
    RRF only consumes RANKS, so the fusion is retriever-agnostic).
    Hash-exact because each term is a single IEEE division of small
    ints and each doc sums exactly ≤2 terms (two-operand float addition
    is commutative, so no association-order hazard).

    Scale shape: each ranker's global ORDER BY runs on its (small)
    scored candidate set, not the corpus; the fusion is a full-outer
    join of two rank lists — candidate-set sized; top-k is
    TakeOrderedAndProject."""
    from pyspark.sql import Window

    def ranks(terms, id_col, r_col):
        # distinct column names per ranker: both sides share the same
        # scan lineage, so qualified-name disambiguation would be
        # ambiguous in the self-join
        w = Window.orderBy(F.col("score").desc(), "doc_id")
        return lexical_scores(spark, sf, terms).select(
            F.col("doc_id").alias(id_col),
            F.row_number().over(w).alias(r_col),
        )

    ra = ranks(["data", "query", "stream"], "doc_a", "r_a")
    rb = ranks(["join", "filter", "window"], "doc_b", "r_b")
    return (
        ra.join(rb, F.col("doc_a") == F.col("doc_b"), "full_outer")
        .select(
            F.coalesce("doc_a", "doc_b").alias("doc_id"),
            (
                F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_a")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("r_b")), F.lit(0.0))
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(10)
    )


_VOCAB_K = 1000


@register(
    "L-TEXT-19",
    # oracle: same vocab (top-K by count desc, token asc — fully
    # deterministic incl. the rank-K boundary), same OOV=0 convention,
    # per-doc encoding rebuilt with an ORDER BY pos list aggregate
    sql="WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "t AS (SELECT doc_id, unnest(toks) AS tok, "
    "      unnest(range(1, len(toks) + 1)) AS pos FROM d), "
    "c AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok), "
    "v AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS INT) AS id "
    f"     FROM (SELECT * FROM c ORDER BY cnt DESC, tok LIMIT {_VOCAB_K}) q), "
    "j AS (SELECT doc_id, pos, COALESCE(v.id, 0) AS id FROM t LEFT JOIN v ON t.tok = v.tok) "
    "SELECT doc_id, array_to_string(list(CAST(id AS VARCHAR) ORDER BY pos), ' ') AS encoded, "
    " COUNT(*) AS n_tokens, "
    " CAST(SUM(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov "
    "FROM j GROUP BY doc_id ORDER BY doc_id",
)
def l_text_19(spark, sf):
    """Vocabulary build + integer encoding — the word-level
    tokenizer-train-and-apply step of an LLM data pipeline: rank the
    corpus's top-K tokens into a (token → id) vocabulary, then encode
    every document as its id sequence (OOV → 0), with per-doc token/OOV
    counts for the coverage audit.

    Scale shape, stage by stage: (1) token counting is one
    map-side-combined groupBy; (2) top-K selection is
    ``orderBy().limit(K)`` — TakeOrderedAndProject, per-partition heaps,
    NO global sort; (3) id assignment is a row_number window over the
    already-bounded K rows (a deliberate single-partition window on a
    small frame — the bounded case the linter's GLOBAL_WINDOW warning
    exists to distinguish from unbounded data); (4) encoding is
    posexplode + a BROADCAST
    vocab join (KB-MB at any corpus size) + one groupBy(doc_id) that
    rebuilds order via sort_array over (pos, id) structs. The only
    unbounded shuffles are keyed by token and doc_id.
    Real BPE training is iterative merge-rule learning (driver-bounded
    loop over pair counts); word-level top-K is the distributed-friendly
    degenerate case and the standard baseline."""
    from pyspark.sql import Window

    d = load(spark, sf, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    tok = d.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    topk = counts.orderBy(F.col("cnt").desc(), F.col("tok")).limit(_VOCAB_K)
    vocab = topk.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("tok")))
        .cast("int")
        .alias("id"),
    )
    enc = tok.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id", "pos", F.coalesce(F.col("id"), F.lit(0)).alias("id")
    )
    return (
        enc.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "id"))),
                    lambda s: s["id"].cast("string"),
                ),
                " ",
            ).alias("encoded"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("id") == 0, 1).otherwise(0)).cast("bigint").alias("n_oov"),
        )
        .orderBy("doc_id")
    )


_PMI_SQL = """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
total AS (SELECT COUNT(*) AS n FROM toks),
bg AS (
    SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS b
    FROM (SELECT string_split(text, ' ') AS t FROM documents) x
),
big AS (
    SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2,
           COUNT(*) AS c12
    FROM bg GROUP BY w1, w2 HAVING COUNT(*) >= 10
),
scored AS (
    SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
           CAST(c12 * n AS BIGINT) AS lift_num,
           CAST(u1.c * u2.c AS BIGINT) AS lift_den
    FROM big JOIN uni u1 ON u1.w = w1 JOIN uni u2 ON u2.w = w2, total
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(c1 AS BIGINT) AS c1,
       CAST(c2 AS BIGINT) AS c2, lift_num, lift_den,
       CAST(lift_num AS DOUBLE) / lift_den AS lift,
       CAST(ROW_NUMBER() OVER (
           ORDER BY CAST(lift_num AS DOUBLE) / lift_den DESC, w1, w2
       ) AS BIGINT) AS rnk
FROM scored QUALIFY rnk <= 20 ORDER BY rnk
"""


@register("L-TEXT-20", sql=_PMI_SQL)
def l_text_20(spark, sf):
    """Collocation mining by pointwise mutual information (lift): the
    corpus-statistics pass that surfaces multi-word expressions ("new
    york", "machine learning") worth fusing into single tokens before
    vocabulary build (L-TEXT-19) or dedup shingling. The lift ratio
    c12·N / (c1·c2) is carried as an exact int64 numerator/denominator
    pair; the derived double (and the ranking computed FROM it) is the
    same IEEE division on both engines, with (w1, w2) tiebreaks, so
    the top-20 board is hash-identical. Min support c12 ≥ 10 — PMI is
    notoriously noisy on rare pairs.

    Scale shape: two corpus passes (unigram and bigram counts), each a
    map-only explode + map-side-combined rollup; the scoring join is
    bigram-table ⋈ vocabulary (twice) on the word key, and the final
    top-20 is TakeOrderedAndProject over the support-filtered bigram
    table. N rides along as a broadcast scalar, not a driver constant."""
    docs = load(spark, sf, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("n"))
    # guard: sequence(1, 0) is DESCENDING in Spark — a 1-token doc would
    # index out of bounds (DuckDB's range(1, 1) is empty and safe)
    bigram_expr = F.expr(
        "case when size(split(text, ' ')) >= 2 then "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> struct(element_at(split(text, ' '), i) AS w1, "
        "element_at(split(text, ' '), i + 1) AS w2)) "
        "else array() end"
    )
    big = (
        docs.select(F.explode(bigram_expr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .filter(F.col("c12") >= 10)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1").cast("bigint").alias("c1"),
            F.col("c2").cast("bigint").alias("c2"),
            (F.col("c12") * F.col("n")).cast("bigint").alias("lift_num"),
            (F.col("c1") * F.col("c2")).cast("bigint").alias("lift_den"),
        )
        .withColumn("lift", F.col("lift_num").cast("double") / F.col("lift_den"))
    )
    w = Window.orderBy(F.desc("lift"), "w1", "w2")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 20)
        .orderBy("rnk")
    )


_PIPE5_SQL = """
WITH d AS (
  SELECT doc_id, lang, text, length(text) AS nc,
         length(text) - length(replace(text, ' ', '')) + 1 AS ntok
  FROM documents),
dup AS (
  SELECT CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS n_dup_rows
  FROM (SELECT text, COUNT(*) AS cnt FROM d GROUP BY text) g)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(nc) AS BIGINT) AS total_chars,
       CAST(SUM(ntok) AS BIGINT) AS total_tokens,
       CAST(MIN(nc) AS BIGINT) AS min_chars,
       CAST(MAX(nc) AS BIGINT) AS max_chars,
       CAST(MAX(dup.n_dup_rows) AS BIGINT) AS n_dup_rows,
       CAST((MAX(dup.n_dup_rows) * 1000) // COUNT(*) AS BIGINT)
         AS dup_pm
FROM d, dup
"""


@register("L-PIPE-05", sql=_PIPE5_SQL)
def l_pipe_05(spark, sf):
    """Dataset card generation (the "datasheets for datasets"
    artifact): one structured row summarizing the corpus a release
    ships with — document/language counts, exact char and
    whitespace-token totals, length extremes, and the exact-duplicate
    rate as integer per-mille (rows beyond the first occurrence of
    each distinct text). Every release of a training corpus should
    carry this row; regenerating it after each pipeline stage
    (dedup, quality gate, mixture) turns "what did that stage do" into
    a diff of two rows. Exact integer carriers throughout — including
    the duplicate rate, floored per-mille, so the card is
    hash-comparable across engines and runs.

    Scale shape: one map-side-combined aggregate over the corpus plus
    one text-keyed shuffle for the duplicate count (hash the text to
    16 bytes pre-shuffle at 100 TB — L-TEXT-15's discipline); the card
    itself is a single row however large the corpus."""
    d = load(spark, sf, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.length("text").alias("nc"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).alias("ntok"),
    )
    dup = (
        d.groupBy("text")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg((F.sum("cnt") - F.count(F.lit(1))).cast("bigint").alias("n_dup_rows"))
    )
    card = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.sum("nc").cast("bigint").alias("total_chars"),
        F.sum("ntok").cast("bigint").alias("total_tokens"),
        F.min("nc").cast("bigint").alias("min_chars"),
        F.max("nc").cast("bigint").alias("max_chars"),
    )
    return card.crossJoin(F.broadcast(dup)).select(
        "n_docs",
        "n_langs",
        "total_chars",
        "total_tokens",
        "min_chars",
        "max_chars",
        "n_dup_rows",
        F.expr("(n_dup_rows * 1000) div n_docs").cast("bigint").alias("dup_pm"),
    )


_T21_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
c AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(COUNT(*) * length(tok) AS BIGINT) AS chars
      FROM tok WHERE length(tok) > 0 GROUP BY doc_id, tok),
d AS (SELECT doc_id, CAST(SUM(chars) AS BIGINT) AS tot_chars,
             CAST(COALESCE(SUM(CASE WHEN cnt >= 2 THEN chars END), 0)
                  AS BIGINT) AS dup_chars
      FROM c GROUP BY doc_id),
top AS (SELECT doc_id, tok AS top_tok, chars AS top_chars FROM (
          SELECT doc_id, tok, chars,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY cnt DESC, tok) AS rn
          FROM c) z
        WHERE rn = 1)
SELECT d.doc_id, tot_chars, top_tok, top_chars,
       CAST(top_chars * 1000 // tot_chars AS BIGINT) AS top_pm,
       dup_chars,
       CAST(dup_chars * 1000 // tot_chars AS BIGINT) AS dup_pm,
       (top_chars * 1000 // tot_chars <= 120
        AND dup_chars * 1000 // tot_chars <= 800) AS pass_gate
FROM d JOIN top ON d.doc_id = top.doc_id
ORDER BY d.doc_id
"""


@register("L-TEXT-21", sql=_T21_SQL)
def l_text_21(spark, sf):
    """Within-document repetition quality gate (the Gopher/RefinedWeb
    rule family "fraction of characters in the most common n-gram" /
    "fraction of characters in duplicated spans", Rae et al. 2021 §A1.1,
    word-grain here): per document, the exact character mass of the
    single most frequent token (ties broken to the lexicographically
    smallest, so both engines pick the same one) and of ALL tokens
    occurring >= 2 times, each as a floor-per-mille share of total token
    characters, plus the keep/drop gate at top<=120 permille AND
    dup<=800 permille — thresholds that split this corpus ~74%/~43%
    respectively, so BOTH conditions are load-bearing in the hash.
    Complements L-TEXT-10 (entropy, a summary score), L-TEXT-12
    (consecutive runs), and L-TEXT-15 (cross-corpus dup n-grams): this
    is the within-doc rule an operator actually thresholds on.

    Scale shape: explode -> one (doc, token)-grain aggregate -> one
    doc-grain rollup plus a doc-partitioned top-1 window (parallel
    across docs, never global). Everything is exact integer arithmetic;
    per-token rows collapse map-side before the only shuffle."""
    toks = (
        load(spark, sf, "documents")
        .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.length("tok") > 0)
    )
    c = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        (F.count(F.lit(1)) * F.length("tok")).cast("bigint").alias("chars"),
    )
    d = c.groupBy("doc_id").agg(
        F.sum("chars").cast("bigint").alias("tot_chars"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") >= 2, F.col("chars"))), F.lit(0)
        )
        .cast("bigint")
        .alias("dup_chars"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("tok"))
    top = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("tok").alias("top_tok"),
            F.col("chars").alias("top_chars"),
        )
    )
    return (
        d.join(top, "doc_id")
        .select(
            "doc_id",
            "tot_chars",
            "top_tok",
            "top_chars",
            F.expr("top_chars * 1000 div tot_chars")
            .cast("bigint")
            .alias("top_pm"),
            "dup_chars",
            F.expr("dup_chars * 1000 div tot_chars")
            .cast("bigint")
            .alias("dup_pm"),
            (
                (F.expr("top_chars * 1000 div tot_chars") <= 120)
                & (F.expr("dup_chars * 1000 div tot_chars") <= 800)
            ).alias("pass_gate"),
        )
        .orderBy("doc_id")
    )


_PIPE6_SQL = """
WITH t AS (
  SELECT doc_id, text,
         's' || substr(md5('s#' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         md5('o#' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       MIN(h) AS first_key, MAX(h) AS last_key
FROM t GROUP BY shard ORDER BY shard
"""


@register("L-PIPE-06", sql=_PIPE6_SQL)
def l_pipe_06(spark, sf):
    """Deterministic pre-training corpus shuffle + resharding, as a
    WRITE ROUND-TRIP (the L-PIPE-02 discipline): every training run
    starts by breaking the corpus's crawl/source order — here each doc
    gets an md5 shard (16 shards) and an md5 within-shard sort key, the
    corpus is physically rewritten partitioned-by-shard with
    sortWithinPartitions(order key), re-read, and the per-shard
    manifest (doc/token counts, id checksum, first/last sort key) is
    hash-checked against the oracle computed from the ORIGINAL table —
    proving the shuffle is a permutation (nothing lost, nothing
    duplicated) and bit-reproducible on any engine, rerun, or
    partitioning (no seeded PRNG, the mixture.py discipline).

    Scale shape: EXACTLY the production writer — one hash shuffle
    (repartition on shard) + a per-partition sort, no global order
    anywhere; hash uniformity is what makes every shard an unbiased
    sample of the corpus. Shard count is the knob (here 16 = one hex
    char; a 100 TB corpus widens the prefix so shards land near the
    target file size) and maxRecordsPerFile bounds file size within a
    shard."""
    out_dir = scratch_dir("shard_shuffle")
    docs = load(spark, sf, "documents").select(
        "doc_id",
        "text",
        F.concat(
            F.lit("s"),
            F.substring(
                F.md5(F.concat(F.lit("s#"), F.col("doc_id").cast("string"))), 1, 1
            ),
        ).alias("shard"),
        F.md5(F.concat(F.lit("o#"), F.col("doc_id").cast("string"))).alias("h"),
    )
    (
        docs.repartition("shard")
        .sortWithinPartitions("h")
        .write.partitionBy("shard")
        .option("maxRecordsPerFile", 100000)
        .mode("overwrite")
        .parquet(out_dir)
    )
    back = spark.read.parquet(out_dir)
    result = (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_toks"),
            F.sum("doc_id").cast("long").alias("id_sum"),
            F.min("h").alias("first_key"),
            F.max("h").alias("last_key"),
        )
        .orderBy("shard")
        # materialized so the round-trip read happens NOW; the scratch
        # dir is NOT eagerly removed — localCheckpoint blocks are
        # non-reliable (an executor loss would recompute lineage from
        # the deleted files); scratch_dir wipes it on the next call
        .localCheckpoint()
    )
    return result
