"""Deduplication operators (SURVEY.md §2G + training-data-pipeline surface).

Five strategies, each the idiomatic Spark shape for its scale regime:

- L-DEDUP-01 exact: content hash + groupBy — one shuffle on the hash key,
  the only exact-dedup shape that works at 100 TB (never a pairwise join).
- L-DEDUP-02 MinHash LSH: MLlib MinHashLSH over shingle features;
  candidate pairs come from approxSimilarityJoin (band-bucket join), so
  cost is ~O(candidates), not O(n²).
- L-DEDUP-03 word-level Jaccard via token inverted index — exact
  similarity for verification; the token join is the textbook
  posting-list self-join. At 100 TB this needs the LSH variant above or
  rare-token blocking (the hot-token skew is the known failure mode).
- L-DEDUP-04 SimHash: 64-bit fingerprint from per-token md5-nibble bit
  votes — pure column algebra + one groupBy, linear and shuffle-light
  (upgraded golden→hash r12: every bit of every fingerprint
  oracle-pinned).
- L-DEDUP-05 embedding near-dup: exact cosine over all pairs (small-n
  verification twin of L-SIM-02's LSH path).
"""

from __future__ import annotations

from collections import OrderedDict

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_xgboost_spark.caching import persist_rollup
from dask_xgboost_spark.functions import DUCK_DOT12, DUCK_NORM12, md5_poly
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load


@register(
    "L-DEDUP-01",
    # fixture texts are all unique, so duplicates are planted in-query
    # (a shifted copy of doc_id < 100) to make keeper/n_dups load-bearing
    sql="SELECT h, CAST(MIN(doc_id) AS BIGINT) AS keeper, COUNT(*) AS n_dups FROM ("
    "SELECT doc_id, sha256(text) AS h FROM ("
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000, text FROM documents WHERE doc_id < 100) u) t "
    "GROUP BY h ORDER BY h",
)
def l_dedup_01(spark, sf):
    """Exact dedup by SHA-256 content hash: keep min doc_id per hash
    (planted duplicates have n_dups = 2, keeper = the original id)."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 100).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return (
        docs.unionByName(planted)
        .select("doc_id", F.sha2("text", 256).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_dups"))
        .orderBy("h")
    )


def minhash_candidates(docs, dist_threshold: float = 0.5, num_tables: int = 8):
    """Near-dup candidate pairs via MinHash LSH over 3-word shingles.

    Pipeline: shingle (3-gram of tokens) → HashingTF (2^18 dims) →
    MinHashLSH → approxSimilarityJoin at Jaccard *distance* ≤ threshold.
    ``docs`` needs (doc_id, text). Cost ~O(candidate pairs), not O(n²).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = docs.select("doc_id", "text").withColumn("tokens", F.split("text", " "))
    shingled = toks.withColumn(
        "shingles",
        F.expr(
            "transform(sequence(0, size(tokens) - 3), "
            "i -> concat_ws(' ', slice(tokens, i + 1, 3)))"
        ),
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    # both sides of the self-similarity-join re-derive shingling +
    # hashing unless the featurized frame is materialized once
    feat = persist_rollup(tf.transform(shingled))
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, dist_threshold, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("d1"),
            F.col("datasetB.doc_id").alias("d2"),
            F.col("jaccard_dist"),
        )
        .orderBy("d1", "d2")
    )


@register(
    "L-DEDUP-06",
    sql="SELECT h, CAST(MIN(doc_id) AS BIGINT) AS keeper, COUNT(*) AS n FROM ("
    "SELECT doc_id, sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h "
    "FROM (SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 200000, upper(text) || '  ' FROM documents "
    "WHERE doc_id < 50) u) t GROUP BY h ORDER BY h",
)
def l_dedup_06(spark, sf):
    """Canonicalization dedup: case-fold, collapse whitespace, trim, THEN
    hash — catches trivially-reformatted duplicates that exact hashing
    misses (50 planted upper-cased + padded copies collapse onto their
    originals)."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  ")).alias("text"),
    )
    canon = F.sha2(
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), 256
    )
    return (
        docs.unionByName(planted)
        .select("doc_id", canon.alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
        .orderBy("h")
    )


@register("L-DEDUP-02", sql=None, mode="golden")
def l_dedup_02(spark, sf):
    """Near-dup candidates via MinHash LSH (see minhash_candidates).
    Golden-checked: tests plant perturbed near-duplicate docs and assert
    recall; sketch internals are engine-specific so no SQL oracle."""
    return minhash_candidates(load(spark, sf, "documents"))


# The fixture vocabulary is tiny (31 words), so word-*set* similarity is
# inflated for unrelated docs; 0.95 keeps the output to true near-dups.
_JACCARD_THRESHOLD = 0.95

# shared CTE text: tokenize → posting self-join → exact Jaccard pairs
_DEDUP_PAIR_CTES = """
tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (SELECT d1, d2, inter, CAST(inter AS DOUBLE) / (c1.n + c2.n - inter) AS jaccard
      FROM pair JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id)
"""

_DEDUP03_SQL = f"""
WITH {_DEDUP_PAIR_CTES}
SELECT d1, d2, CAST(inter AS BIGINT) AS inter, jaccard FROM j
WHERE jaccard >= {_JACCARD_THRESHOLD} ORDER BY d1, d2
"""


# Mask-count ceiling for the bitmap path's broadcast pair join (advisor,
# r12): distinct masks are bounded by 2^|vocab| — up to 2^64 — NOT by the
# vocabulary size, so a huge small-vocab corpus with near-unique masks
# could OOM the forced broadcast of the full mask table before the
# quadratic even bites. 1M masks ≈ 16 MB broadcast (safe on any executor)
# and ≤ 5·10¹¹ codegen popcount comparisons — past that, the bitmap NLJ
# is no longer the fast plan anyway, and the posting join degrades
# gracefully (shuffles, never broadcasts an unbounded build side).
_BITMAP_MASK_LIMIT = 1_000_000


def _mask_expr(vocab: list):
    """Strict token → 2^bit lookup column for the bitmap-Jaccard path."""
    # literal word → 2^bit map (bit 63 carried as the SIGNED -2^63 power,
    # the SimHash-assembly trick, so every mask stays in int64)
    power = F.create_map(
        *[
            x
            for k, word in enumerate(vocab)
            for x in (F.lit(word), F.lit((1 << k) if k < 63 else -(1 << 63)))
        ]
    )
    # STRICT lookup: the vocab was probed in a separate job, so a token
    # unseen at probe time (non-deterministic input, a source appended
    # between the two jobs, a 65th token appearing at evaluation) must
    # fail LOUDLY — a plain map access would yield NULL, F.sum would
    # silently drop it, and the masks (hence jaccard) would be wrong
    return F.coalesce(
        power[F.col("w")],
        F.raise_error(
            F.concat(
                F.lit("jaccard_pairs bitmap gate: token not in the probed "
                      "vocabulary (input changed between probe and "
                      "evaluation?): "),
                F.col("w"),
            )
        ).cast("bigint"),
    )


def _jaccard_pairs_bitmap(tok, cnt, vocab: list, threshold: float):
    """Exact set-Jaccard pairs when the distinct-token universe fits 64
    bits (gated by the caller, which passes the full sorted vocabulary
    AND has verified the distinct-mask count fits _BITMAP_MASK_LIMIT):
    token w gets bit position index(w) in the sorted vocab — a literal
    array_position lookup, no join, no window — each doc's set folds to
    ONE int64 mask, and the quadratic work runs over DISTINCT masks with
    popcount arithmetic, never over doc-level posting lists. Identical-
    mask docs expand as intra-group pairs (jaccard exactly 1.0);
    qualifying cross-mask pairs expand back to doc pairs through two
    equi-joins on the mask."""
    docmask = (
        tok.groupBy("doc_id")
        .agg(
            # distinct (doc_id, w) input → distinct bits, so SUM of the
            # per-bit powers IS the bitwise OR
            F.sum(_mask_expr(vocab)).alias("mask")
        )
        .join(cnt, "doc_id")
    )
    # referenced ~5× downstream (mask table twice, doc expansion twice,
    # intra self-join twice) — persist the per-doc row once instead of
    # re-running tokenize+distinct+groupBy per reference
    docmask = persist_rollup(docmask)
    masks = docmask.groupBy("mask").agg(
        F.min("n").alias("n")  # n = popcount(mask), constant per mask
    )
    # Runtime twin of the probe's mask-count gate (r13 review finding):
    # a CACHED "bitmap" decision can outlive the data it was probed on
    # (same path overwritten in place with a same-vocab corpus of
    # vastly more distinct masks), and the strict token lookup only
    # catches NEW tokens — so re-assert the bound inside the plan
    # itself. The 1-row count crossJoin is the provably-bounded scalar
    # shape (lint BNLJ_SCALAR); if the bound no longer holds, the mask
    # pair join's broadcast build fails LOUDLY on its first row instead
    # of OOMing.
    nm = masks.agg(F.count(F.lit(1)).alias("__nm"))
    masks = (
        masks.crossJoin(F.broadcast(nm))
        .withColumn(
            "mask",
            F.when(
                F.col("__nm") <= _BITMAP_MASK_LIMIT, F.col("mask")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "jaccard_pairs bitmap gate: distinct-mask "
                            "count "
                        ),
                        F.col("__nm").cast("string"),
                        F.lit(
                            " exceeds the broadcast bound (input "
                            "changed between probe and evaluation?)"
                        ),
                    )
                ).cast("bigint")
            ),
        )
        .drop("__nm")
    )
    ma = masks.select(F.col("mask").alias("m1"), F.col("n").alias("n1"))
    mb = masks.select(F.col("mask").alias("m2"), F.col("n").alias("n2"))
    mpairs = (
        ma.join(F.broadcast(mb), F.col("m1") < F.col("m2"))
        .withColumn("inter", F.bit_count(F.col("m1").bitwiseAND(F.col("m2"))).cast("bigint"))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("m1", "m2", "inter", "jaccard")
    )
    da = docmask.select(F.col("doc_id").alias("da"), F.col("mask").alias("m1"))
    db = docmask.select(F.col("doc_id").alias("db"), F.col("mask").alias("m2"))
    cross = (
        mpairs.join(da, "m1")
        .join(db, "m2")
        .select(
            F.least("da", "db").alias("d1"),
            F.greatest("da", "db").alias("d2"),
            "inter",
            "jaccard",
        )
    )
    intra = (
        docmask.alias("x")
        .join(
            docmask.alias("y"),
            (F.col("x.mask") == F.col("y.mask"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("d1"),
            F.col("y.doc_id").alias("d2"),
            F.col("x.n").cast("bigint").alias("inter"),
            # same double-division expression as every other path:
            # n/(n+n-n) = 1.0 exactly
            (
                F.col("x.n").cast("double")
                / (F.col("x.n") + F.col("y.n") - F.col("x.n"))
            ).alias("jaccard"),
        )
    )
    return cross.unionByName(intra).orderBy("d1", "d2")


# Probe-decision cache for jaccard_pairs, keyed on (input semanticHash,
# threshold) the way composite.py caches parquet footer counts (advisor,
# r12): the plan probe runs bounded Spark jobs at DataFrame-CONSTRUCTION
# time, and registry sweeps / partition-invariance suites construct the
# same query repeatedly — without the cache each construction re-scans.
# semanticHash is stable for file-backed plans (same path → same hash,
# measured) and collision-safe for ad-hoc local frames (fresh expr IDs →
# fresh hash → plain cache miss). Staleness (files overwritten in place
# under an unchanged path) cannot produce wrong VALUES or a silent OOM:
# a stale "bitmap" vocabulary fails loudly through the strict
# raise_error lookup, a same-vocab corpus grown past the mask bound
# fails loudly through the runtime mask-count guard inside
# _jaccard_pairs_bitmap, and a stale "posting" decision is merely the
# always-correct general plan. LRU at 256 entries (VERDICT r13 note:
# the original clear-the-whole-dict policy discarded every cached
# decision at capacity; an OrderedDict with hit-refresh evicts only the
# least-recently-used key, so long-lived drivers sweeping many corpora
# keep their hot decisions).
_JACCARD_PLAN_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_JACCARD_PLAN_CACHE_CAP = 256


def _probe_jaccard_plan(tok, threshold: float):
    """Measured plan choice for exact-Jaccard pair search: ``("bitmap",
    vocab)`` when the corpus's whole distinct-token universe fits 64 bits
    AND its distinct-mask count fits the broadcast bound, else
    ``("posting", None)``. Runs up to three bounded eager jobs (two
    LIMIT-65 token probes + one single-row mask-count aggregate)."""
    # The gate needs 0 < threshold <= 1.0: at <= 0 the bitmap form would
    # emit zero-overlap pairs the posting join structurally cannot
    # produce (a pair row needs a shared token); at > 1.0 the posting
    # join emits nothing (jaccard <= 1.0 always) while the bitmap
    # intra-branch would still emit every identical-mask pair (advisor,
    # r12 — it assumed jaccard=1.0 passes any threshold).
    if not (0 < threshold <= 1.0):
        return ("posting", None)
    # Two-stage probe so the open-vocab case pays only a PARTIAL scan:
    # stage 1 looks at a bounded token sample — ≥65 distinct there
    # already proves open-vocab (sound: distinct-of-sample ⊆
    # distinct-of-corpus) and skips stage 2, which is the full
    # tokenize+distinct that both DECIDES the plan and supplies the bit
    # assignment.
    # bounded: both probes read AT MOST 65 rows (the LIMIT)
    sample_probe = (
        tok.select("w").limit(100_000).distinct().limit(65).collect()
    )
    if len(sample_probe) > 64:
        return ("posting", None)
    # bounded: full-vocab probe, ≤ 65 rows by the same LIMIT
    vocab_probe = [
        r.w for r in tok.select("w").distinct().limit(65).collect()
    ]
    if not (1 <= len(vocab_probe) <= 64):
        return ("posting", None)
    vocab = sorted(vocab_probe)
    # Broadcast-safety gate (advisor, r12): the bitmap pair join
    # force-broadcasts the full distinct-mask table, and distinct masks
    # are bounded by 2^|vocab| — NOT by the 64-token vocabulary — so
    # count them first (linear job, single-row output) and refuse the
    # bitmap path when the mask table wouldn't be a safe broadcast.
    # Same discipline as the Q8 footer gate: a bounded measurement
    # decides the plan; refusal falls back to the shuffle-based posting
    # join, which degrades gracefully instead of OOMing a broadcast.
    # The per-doc mask aggregate is PERSISTED before counting so the
    # bitmap evaluation plan — which builds the canonically identical
    # aggregate — picks it up through Spark's cache manager: the heavy
    # tokenize+distinct+groupBy runs ONCE across probe and evaluation
    # (r13 review finding), not twice.
    premask = persist_rollup(
        tok.groupBy("doc_id").agg(F.sum(_mask_expr(vocab)).alias("mask"))
    )
    # bounded: countDistinct aggregate returns exactly one row
    n_masks = premask.agg(F.countDistinct("mask")).collect()[0][0]
    if not (0 < n_masks <= _BITMAP_MASK_LIMIT):
        premask.unpersist()
        return ("posting", None)
    # On the SUCCESS path the persist is intentionally NOT released here
    # (advisor note, r13): the evaluation DataFrame this probe admits is
    # returned LAZY and reads the cached aggregate at its consumer's
    # materialization — unpersisting now would make the probe's one-scan
    # guarantee a lie (tokenize+distinct+groupBy would run twice). The
    # entry is registered with persist_rollup, so the documented
    # lifecycle applies: consumers iterating distinct corpora call
    # caching.release_rollups() between them (bench.py/tools already
    # do), exactly like every other operator-internal rollup.
    return ("bitmap", vocab)


def jaccard_pairs(docs, threshold: float = _JACCARD_THRESHOLD, max_token_df: int | None = None):
    """Exact word-set Jaccard pairs via token inverted index.

    NOTE (construction-time jobs): with ``max_token_df=None`` the plan
    gate runs up to three BOUNDED eager Spark jobs when the returned
    DataFrame is merely built (see :func:`_probe_jaccard_plan`) — unlike
    the rest of the package, which is construction-lazy. The decision is
    cached per (input semanticHash, threshold), so repeated construction
    over the same source (registry sweeps, explain-only tooling) probes
    once per process.

    ``max_token_df=None`` (verification scale): single-pass posting-list
    self-join — every shared token produces a pair row, so a token
    appearing in k documents contributes k² join rows. Exact, but a hot
    token (a stopword in millions of docs) makes one join key quadratic —
    the known 100 TB failure mode. A measured plan gate (r12) first
    probes the vocabulary with LIMIT 65: when the corpus's whole
    distinct-token universe fits 64 bits, the bitmap path
    (:func:`_jaccard_pairs_bitmap`) replaces the posting join with
    popcount arithmetic over distinct set-masks (itself gated on a
    counted distinct-mask bound, since the mask pair join broadcasts the
    mask table — see :func:`_probe_jaccard_plan`) — bitwise-identical
    output, measured 145.7 s → 13.8 s Spark-side at sf0.1 (10.6×),
    where the 31-word fixture vocabulary makes every posting list
    ~n-long and the join output Σ df² ≈ 435M rows.

    ``max_token_df=T`` (production scale): rare-token blocking. Candidate
    pairs are generated ONLY from tokens whose document frequency is ≤ T,
    bounding every posting list (join-key group) to T² pair rows; the
    intersection is then re-counted exactly over ALL tokens for just the
    candidate pairs, so reported (inter, jaccard) values are exact. A true
    pair is missed only when every shared token is hot (df > T) — for
    near-duplicate detection at sensible T (≥ ~10³) such pairs share only
    ubiquitous stopwords and are far below any useful threshold anyway.
    tests/test_golden.py asserts blocked == unblocked output on skewed
    data and that the candidate join input actually shrinks.
    """
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w")).distinct()
    cnt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if max_token_df is None:
        # measured plan gate (the Q8 footer-gate pattern applied to plan
        # CHOICE): when the corpus's whole distinct-token universe fits a
        # 64-bit word, each doc's token SET is one integer bitmask and
        # set-Jaccard is popcount arithmetic over DISTINCT masks — the
        # bitmap-index discipline (Q-AGG-23) applied to set similarity.
        # The posting join materializes Σ_w df(w)² rows (~435M on the
        # 31-word sf0.1 fixture, 145 s); the bitmap path compares
        # |distinct masks|² integer pairs instead (~7.7M, seconds), with
        # BITWISE-identical output (inter = popcount(a&b) equals the
        # shared-token count; jaccard is the same double division). Open
        # vocabularies (> 64 tokens — any real corpus) take the posting
        # join below, whose hot-token failure mode max_token_df handles.
        # The probe result is cached per (semanticHash, threshold) — see
        # _JACCARD_PLAN_CACHE; hash failure just means no caching.
        try:
            key = (docs.semanticHash(), float(threshold))
        except Exception:  # noqa: BLE001 — hash is an optimization only
            key = None
        plan = _JACCARD_PLAN_CACHE.get(key) if key is not None else None
        if plan is not None:
            _JACCARD_PLAN_CACHE.move_to_end(key)  # LRU hit-refresh
        else:
            plan = _probe_jaccard_plan(tok, threshold)
            if key is not None:
                while len(_JACCARD_PLAN_CACHE) >= _JACCARD_PLAN_CACHE_CAP:
                    _JACCARD_PLAN_CACHE.popitem(last=False)
                _JACCARD_PLAN_CACHE[key] = plan
        if plan[0] == "bitmap":
            return _jaccard_pairs_bitmap(tok, cnt, plan[1], threshold)
        a, b = tok.alias("a"), tok.alias("b")
        pair = (
            a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        rare = (
            tok.groupBy("w")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_token_df)
            .select("w")
        )
        rare_tok = tok.join(rare, "w")
        ra, rb = rare_tok.alias("a"), rare_tok.alias("b")
        cand = (
            ra.join(rb, (F.col("a.w") == F.col("b.w")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
            .distinct()
        )
        # exact re-count over ALL tokens, restricted to candidate pairs:
        # cost ∝ |candidates| × tokens-per-doc, never quadratic in df
        ta = tok.select(F.col("doc_id").alias("d1"), F.col("w").alias("wa"))
        tb = tok.select(F.col("doc_id").alias("_d2b"), F.col("w").alias("wb"))
        pair = (
            cand.join(ta, "d1")
            .join(tb, (F.col("d2") == F.col("_d2b")) & (F.col("wa") == F.col("wb")))
            .groupBy("d1", "d2")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    c1 = cnt.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    c2 = cnt.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    j = (
        pair.join(c1, "d1")
        .join(c2, "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
    )
    return (
        j.filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "inter", "jaccard")
        .orderBy("d1", "d2")
    )


@register("L-DEDUP-03", sql=_DEDUP03_SQL)
def l_dedup_03(spark, sf):
    """Exact word-set Jaccard via inverted-index self-join (hash-checked
    against the oracle's identical formulation). jaccard = |∩| / |∪| as a
    double division of exact ints — cross-engine identical. The fixture
    vocabulary is tiny (~31 words, every token "hot"), which is exactly
    the regime jaccard_pairs' measured bitmap gate detects (vocab ≤ 64
    → set-masks + popcounts instead of the Σ df² posting join; identical
    hashes, 10.6× less wall at sf0.1); open-vocabulary production
    corpora take the posting join with ``max_token_df=...`` blocking —
    see the helper's docstring."""
    return jaccard_pairs(load(spark, sf, "documents"))


def connected_components(
    edges, src: str = "a", dst: str = "b", max_iter: int = 25
):
    """Undirected connected components over an edge list → (node,
    component) where component = the minimum node id reachable.

    HashMin label propagation, pure DataFrame ops: every node starts
    labeled with its own id; each round every node takes the min of its
    own and its neighbors' labels; converges in O(graph diameter) rounds
    (each round = one shuffle on the edge key + one on the node key).
    Near-duplicate clusters are near-cliques (diameter ≤ ~2), so this is
    the right shape for dedup grouping; for general graphs at 100 TB with
    long chains, the star-contraction variant (Kiveris et al., "Connected
    Components in MapReduce and Beyond") converges in O(log n) rounds and
    should replace the loop body. Each iteration is truncated with
    ``localCheckpoint`` — plain cache() flattens EXECUTION but the logical
    plan still nests every prior round (the join + convergence check
    reference the previous labels twice → exponential plan text); on a
    fault-tolerant cluster use ``checkpoint()`` with a checkpoint dir
    instead. Convergence is detected distributedly (count of changed
    labels), never by collecting labels.
    """
    a, b = F.col(src), F.col(dst)
    sym = (
        edges.select(a.alias("s"), b.alias("t"))
        .union(edges.select(b.alias("s"), a.alias("t")))
        .distinct()
        .localCheckpoint()  # materialize the (possibly expensive) edges once
    )
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.s == labels.node)
            .groupBy(F.col("t").alias("node2"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neigh, labels.node == neigh.node2, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): returned components are "
            "incomplete. The graph diameter exceeds max_iter — raise it, or "
            "for long-chain graphs switch to star contraction (Kiveris et "
            "al.), which converges in O(log n) rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


_DEDUP07_SQL = f"""
WITH RECURSIVE {_DEDUP_PAIR_CTES},
p AS (SELECT d1, d2 FROM j WHERE jaccard >= {_JACCARD_THRESHOLD}),
edges AS (SELECT d1 AS a, d2 AS b FROM p UNION SELECT d2 AS a, d1 AS b FROM p),
walk(node, label) AS (
    SELECT a, a FROM edges
    UNION
    SELECT e.b, w.label FROM walk w JOIN edges e ON e.a = w.node WHERE w.label < e.b
),
comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node)
SELECT component, COUNT(*) AS n_docs, CAST(MAX(node) AS BIGINT) AS max_doc
FROM comp GROUP BY component ORDER BY component
"""


@register("L-DEDUP-07", sql=_DEDUP07_SQL)
def l_dedup_07(spark, sf):
    """Near-duplicate GROUPS: connected components over the exact-Jaccard
    pair graph (L-DEDUP-03's edges) — the step a real dedup pipeline needs
    after pairwise similarity, since keep-one-per-group requires clusters,
    not pairs. Spark side: HashMin label propagation (see
    ``connected_components``); oracle: DuckDB recursive CTE doing min-label
    reachability (propagation is pruned to label < node, which every
    min-label path satisfies). Output: one row per component with its
    canonical keeper (= component id, the min doc_id), member count, and
    max member."""
    pairs = jaccard_pairs(load(spark, sf, "documents"))
    cc = connected_components(pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b")))
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.max("node").alias("max_doc"))
        .orderBy("component")
    )


_HEX = "0123456789abcdef"
_DEDUP04_SQL = (
    "WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
    "FROM documents), nib AS (SELECT doc_id, "
    + ", ".join(
        f"strpos('{_HEX}', substr(m, {k + 1}, 1)) - 1 AS n{k}" for k in range(16)
    )
    + " FROM (SELECT doc_id, md5(w) AS m FROM tok) h), "
    "votes AS (SELECT doc_id, "
    + ", ".join(
        f"SUM(CASE WHEN ((n{i // 4} >> {i % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(64)
    )
    + " FROM nib GROUP BY doc_id) "
    "SELECT doc_id, CAST((CASE WHEN s63 > 0 THEN -9223372036854775808 ELSE 0 END) + "
    + " + ".join(f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(63))
    + " AS BIGINT) AS simhash FROM votes ORDER BY doc_id"
)


@register("L-DEDUP-04", sql=_DEDUP04_SQL)
def l_dedup_04(spark, sf):
    """SimHash-64 document fingerprint, pure column algebra:

    token → md5 → 16 hex nibbles → per-bit ±1 votes → per-doc vote sums →
    sign bits → 64-bit fingerprint. One explode + one groupBy — linear at
    any scale.

    Upgraded golden→hash (r12, the L-DEDUP-14/L-SIM-14 discipline applied
    to the SimHash tier): the original per-token hash was xxhash64, which
    has no DuckDB twin, so the entry was permanently golden. Replacing it
    with md5 hex nibbles — bit i of the fingerprint comes from bit (i%4)
    of nibble (i//4), each nibble decoded with the portable
    instr('0123456789abcdef', hex_char)-1 idiom — makes EVERY bit of
    EVERY fingerprint oracle-pinned (bit extraction, vote tally, sign,
    and the final int64 assembly, where bit 63 lands as an explicit
    -2^63 term so neither engine's signed arithmetic overflows). Hash
    quality is equivalent for near-dup voting (md5 bits are as uniform
    as xxhash64's); the fingerprint VALUES change, which is fine — the
    contract is the mechanism, not a frozen hash. tests/test_golden.py
    keeps the semantic pins (determinism, equal text ⇒ equal simhash)."""
    docs = load(spark, sf, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    nib = tok.select(
        "doc_id",
        *[
            (F.expr(f"instr('{_HEX}', substr(md5(w), {k + 1}, 1))") - 1).alias(
                f"n{k}"
            )
            for k in range(16)
        ],
    )
    # votes: +1 if bit i of the token hash is set else -1, summed per doc
    votes = nib.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"n{i // 4}"), i % 4).bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(64)
        ]
    )
    fp = votes.select(
        "doc_id",
        (
            F.when(F.col("s63") > 0, F.lit(-(1 << 63)).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            + sum(
                [
                    F.when(
                        F.col(f"s{i}") > 0, F.lit(1 << i).cast("bigint")
                    ).otherwise(F.lit(0).cast("bigint"))
                    for i in range(63)
                ],
                F.lit(0).cast("bigint"),
            )
        ).alias("simhash"),
    )
    return fp.orderBy("doc_id")


_DEDUP05_COS = (
    f"({DUCK_DOT12.format(a='a.embedding', b='b.embedding')}) / (a.nrm * b.nrm)"
)
_DEDUP05_SQL = (
    "WITH planted AS (SELECT vec_id + 100000 AS vec_id, "
    "list_transform(range(1, len(embedding) + 1), i -> "
    "CASE WHEN i = 1 THEN CAST(CAST(embedding[1] AS DOUBLE) * 1.05 AS FLOAT) "
    "ELSE embedding[i] END) AS embedding "
    "FROM embeddings WHERE vec_id < 20), "
    "u AS (SELECT vec_id, embedding FROM embeddings "
    "UNION ALL SELECT vec_id, embedding FROM planted), "
    f"n AS (SELECT vec_id, embedding, {DUCK_NORM12.format(a='embedding')} AS nrm "
    "FROM u) "
    f"SELECT * FROM (SELECT a.vec_id AS v1, b.vec_id AS v2, {_DEDUP05_COS} "
    "AS cosine FROM n a JOIN n b ON a.vec_id < b.vec_id) s "
    "WHERE cosine >= 0.95 ORDER BY v1, v2"
)


@register("L-DEDUP-05", sql=_DEDUP05_SQL)
def l_dedup_05(spark, sf):
    """Embedding cosine near-duplicate pairs (exact, brute force).

    The fixture vectors are near-uniform on the sphere (no natural pair
    reaches cosine 0.95), so near-duplicates are planted in-query: 20
    vectors re-appear under shifted ids with one coordinate scaled 5%.
    Every planted pair must be found (golden check in tests).

    Upgraded golden→hash (r12, third upgrade of the round): the cosine
    already used the fixed-point FLOOR(x*y*1e12) anchor that makes the
    double identical in both engines (the L-SIM-01 discipline), and the
    in-query perturbation is one IEEE float multiply both engines
    reproduce bitwise — so the full pair set AND each pair's cosine are
    oracle-pinned. Both sides precompute each vector's norm once (the
    oracle's n CTE mirrors cosine_pairs' per-row norm), so cosine =
    dot/(na*nb) is the same expression tree in both engines.

    Declared for verification scale; the 100 TB path is L-SIM-02/03's
    LSH/IVF pruning. Cosine via cosine_pairs (similarity.py), which
    r12 also fixed to parallelize the pair join and stop recomputing
    norms per pair (215 s → seconds at sf0.1, bitwise-identical)."""
    from dask_xgboost_spark.operators.similarity import cosine_pairs

    emb = load(spark, sf, "embeddings").select("vec_id", "embedding")
    perturbed = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> "
            "CAST(CAST(x AS DOUBLE) * (CASE WHEN i = 0 THEN 1.05 ELSE 1.0 END) AS FLOAT))"
        ).alias("embedding"),
    )
    return cosine_pairs(emb.unionByName(perturbed), threshold=0.95).orderBy("v1", "v2")


_DECON_DOCS = (
    "(SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 300000, 'prefix words added here ' || text "
    "FROM documents WHERE doc_id % 97 = 0)"
)

_DECON_GRAMS = (
    "(SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram "
    f"FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {_DECON_DOCS} d) t, "
    "unnest(range(1, len(w) - 3)) AS u(i) WHERE len(w) >= 5)"
)

_DEDUP08_SQL = (
    f"SELECT c.doc_id, CAST(COUNT(DISTINCT c.gram) AS BIGINT) AS n_hits "
    f"FROM {_DECON_GRAMS} c "
    f"JOIN (SELECT DISTINCT gram FROM {_DECON_GRAMS} b0 WHERE doc_id % 97 = 0) b "
    "USING (gram) WHERE c.doc_id % 97 != 0 "
    "GROUP BY c.doc_id ORDER BY c.doc_id"
)


@register("L-DEDUP-08", sql=_DEDUP08_SQL)
def l_dedup_08(spark, sf):
    """Benchmark decontamination — flag corpus documents sharing any word
    5-gram with a benchmark set (here: doc_id % 97 == 0 stands in for the
    held-out eval set), the standard leakage gate before training (cf.
    GPT-3 appendix C / PaLM 13-gram overlap). The fixture corpus is
    all-unique, so contaminated docs are planted in-query (each benchmark
    doc re-appears under doc_id+300000 with a changed prefix — exactly
    how eval text leaks into scraped corpora). Shape: explode corpus
    n-grams once, inner-join against the (tiny, broadcast) distinct
    benchmark-gram set, count distinct hits per doc. At 100 TB the
    benchmark side is KBs→MBs (broadcast, no corpus shuffle); the
    per-doc distinct count shuffles on doc_id only for the hit subset —
    the corpus itself is never pairwise-compared."""
    base = load(spark, sf, "documents").select("doc_id", "text")
    planted = base.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat(F.lit("prefix words added here "), F.col("text")).alias("text"),
    )
    docs = base.unionByName(planted)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(F.split("text", " ")) >= 5,
                F.expr(
                    "transform(sequence(1, size(split(text, ' ')) - 4), "
                    "i -> concat_ws(' ', slice(split(text, ' '), i, 5)))"
                ),
            ).otherwise(F.array())
        ).alias("gram"),
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").cast("long").alias("n_hits"))
        .orderBy("doc_id")
    )


_SHINGLE_DOCS = (
    "(SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 400000, text || ' extra' FROM documents "
    "WHERE doc_id < 40)"
)

_DEDUP09_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {_SHINGLE_DOCS} d) t,
                 unnest(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3),
cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
j AS (SELECT d1, d2, inter, CAST(inter AS DOUBLE) / (c1.n + c2.n - inter) AS jaccard
      FROM pair JOIN cnt c1 ON d1 = c1.doc_id JOIN cnt c2 ON d2 = c2.doc_id)
SELECT d1, d2, CAST(inter AS BIGINT) AS inter, jaccard FROM j
WHERE jaccard >= 0.8 ORDER BY d1, d2
"""


@register("L-DEDUP-09", sql=_DEDUP09_SQL)
def l_dedup_09(spark, sf):
    """Exact n-gram (3-word shingle) Jaccard near-dup pairs — the
    order-sensitive counterpart of L-DEDUP-03's word-SET Jaccard:
    shingles capture local word order, so shuffled bags of the same
    words stop colliding and true re-phrasings still match. Same
    inverted-index shape (shingle posting self-join); the fixture corpus
    is unique, so 40 planted one-word-appended copies make the ≥0.8
    threshold load-bearing. Shingle frequencies are far less skewed than
    token frequencies, which is why shingle posting joins survive much
    larger corpora before needing the rare-token blocking that word
    Jaccard requires (L-DEDUP-03's max_token_df)."""
    base = load(spark, sf, "documents").select("doc_id", "text")
    planted = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    docs = base.unionByName(planted)
    shingles = F.expr(
        "case when size(split(text, ' ')) >= 3 then "
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) "
        "else array() end"
    )
    sh = docs.select("doc_id", F.explode(shingles).alias("g")).distinct()
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    pair = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    c1 = cnt.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    c2 = cnt.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    return (
        pair.join(c1, "d1")
        .join(c2, "d2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= 0.8)
        .select("d1", "d2", F.col("inter").cast("long").alias("inter"), "jaccard")
        .orderBy("d1", "d2")
    )


_BOILER = "subscribe to our newsletter for updates right now"


@register(
    "L-DEDUP-10",
    sql="WITH d AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 "
    f"THEN '{_BOILER} ' || text ELSE text END AS text2 FROM documents), "
    "t AS (SELECT doc_id, string_split(text2, ' ') AS toks FROM d), "
    "s AS (SELECT doc_id, unnest(list_transform("
    "range(0, ((len(toks) - 1) // 8) + 1), "
    "i -> array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' '))) AS seg FROM t), "
    "fq AS (SELECT seg, COUNT(DISTINCT doc_id) AS dfq FROM s GROUP BY seg) "
    "SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_seg, "
    "CAST(SUM(CASE WHEN fq.dfq >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, "
    "CAST(SUM(CASE WHEN fq.dfq < 3 THEN len(string_split(s.seg, ' ')) ELSE 0 END) "
    "AS BIGINT) AS clean_n_tok "
    "FROM s JOIN fq USING (seg) GROUP BY s.doc_id ORDER BY s.doc_id",
)
def l_dedup_10(spark, sf):
    """Boilerplate line removal (the C4/RefinedWeb rule: drop any line
    that repeats across ≥ K documents). The fixture text has no line
    structure, so lines are deterministic 8-token segments and a known
    8-token boilerplate segment is planted at the head of every 5th doc
    in-query (head-aligned so it occupies exactly one segment) — the op
    must strip exactly those (load-bearing: ~20% of docs carry it,
    organic segments never repeat across 3+ docs at the fixture vocab).

    Scale shape: segment → one shuffle to count distinct-doc frequency
    per segment (map-side combined), frequency table joins back
    (broadcast when the hot-segment table is small — it is: only
    segments with dfq ≥ 2 matter, and those are by definition few
    relative to the corpus after a pre-filter; shuffle-hash otherwise),
    per-doc rollup. No pairwise comparisons anywhere — cost is linear
    in corpus size, the only shape that survives 100 TB."""
    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit(_BOILER + " "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text2"),
    )
    toks = F.split(F.col("text2"), " ")
    last = F.floor((F.size(toks) - 1) / 8).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), last),
        lambda i: F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
    )
    s = docs.select("doc_id", F.explode(segs).alias("seg"))
    fq = s.groupBy("seg").agg(F.countDistinct("doc_id").alias("dfq"))
    return (
        s.join(F.broadcast(fq), "seg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_seg"),
            F.sum(F.when(F.col("dfq") >= 3, 1).otherwise(0)).alias("n_removed"),
            F.sum(
                F.when(F.col("dfq") < 3, F.size(F.split(F.col("seg"), " "))).otherwise(0)
            ).alias("clean_n_tok"),
        )
        .orderBy("doc_id")
    )


# URL noise applied to the PLANTED variant copies (doc_id < 60, re-keyed
# +700000): tracking params, upper-cased host, trailing slash, fragment.
# Canonicalization must collapse each variant onto its original.
_URL_BASE = (
    "SELECT doc_id, lang, 0 AS noisy FROM documents "
    "UNION ALL SELECT doc_id + 700000, lang, 1 FROM documents WHERE doc_id < 60"
)


@register(
    "L-DEDUP-11",
    # oracle: the ground-truth canonical is derivable directly from the
    # synthesis columns (no URL parsing needed) — the engine must RECOVER
    # it from the noisy URL string; keeper = the original (min doc_id %
    # 700000 keyspace folds variants onto originals for grouping only)
    sql=f"WITH b AS ({_URL_BASE}) "
    "SELECT lang || '.example.com/docs/' || CAST(doc_id % 700000 AS VARCHAR) "
    "  || '?id=' || CAST(doc_id % 7 AS VARCHAR) AS canonical, "
    " CAST(MIN(doc_id) AS BIGINT) AS keeper, COUNT(*) AS n_variants "
    "FROM b GROUP BY canonical ORDER BY canonical",
)
def l_dedup_11(spark, sf):
    """URL canonicalization dedup — the crawl-frontier staple: the same
    page arrives as ``?utm_source=...`` variants, host-case variants,
    trailing-slash variants, and ``#fragment`` variants; byte-dedup sees
    distinct URLs. Canonicalize (lowercase host, strip trailing slash,
    drop fragment, keep only semantic query params) and group.

    The engine PARSES the noisy URL (``parse_url`` HOST/PATH/QUERY —
    single JVM-side parse, per-part extraction) and rebuilds the
    canonical form; the oracle derives the ground-truth canonical
    straight from the synthesis columns — matching output proves the
    parser-based canonicalization recovers truth. Scale shape: map-only
    expressions + one groupBy on the canonical key; the 64-char key
    could be sha2-compressed for shuffle width at 100 TB."""
    b = load(spark, sf, "documents").select("doc_id", "lang")
    planted = (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") < 60)
        .select((F.col("doc_id") + 700000).alias("doc_id"), "lang")
        .withColumn("noisy", F.lit(1))
    )
    rows = b.withColumn("noisy", F.lit(0)).unionByName(planted)
    page_id = F.col("doc_id") % 700000
    host = F.when(
        F.col("noisy") == 1, F.concat(F.upper("lang"), F.lit(".EXAMPLE.com"))
    ).otherwise(F.concat(F.col("lang"), F.lit(".example.com")))
    url = F.concat(
        F.lit("https://"), host, F.lit("/docs/"), page_id.cast("string"),
        F.when(F.col("noisy") == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("noisy") == 1, F.lit("?utm_source=feed&")).otherwise(F.lit("?")),
        F.lit("id="), (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("noisy") == 1, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = rows.select("doc_id", url.alias("url"))
    canonical = F.concat(
        F.lower(F.parse_url("url", F.lit("HOST"))),
        F.regexp_replace(F.parse_url("url", F.lit("PATH")), "/+$", ""),
        F.lit("?id="),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")),
    )
    return (
        u.select("doc_id", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper"),
            F.count(F.lit(1)).alias("n_variants"),
        )
        .orderBy("canonical")
    )


@register(
    "L-DEDUP-12",
    # the ledger is hashes of the historical 80% (doc_id % 10 < 8); the
    # incoming batch is the other 20% PLUS planted re-crawls (copies of
    # historical doc_id < 60 under new ids) and an in-batch double
    # submission (copies of batch doc_id % 40 == 8 under new ids)
    sql="""
    WITH hist AS (SELECT sha256(text) AS h FROM documents WHERE doc_id % 10 < 8),
    batch AS (
        SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 10 >= 8
        UNION ALL
        SELECT doc_id + 200000, sha256(text) FROM documents WHERE doc_id % 10 < 8 AND doc_id < 60
        UNION ALL
        SELECT doc_id + 300000, sha256(text) FROM documents WHERE doc_id % 10 >= 8 AND doc_id % 40 = 8
    ),
    no_hist AS (SELECT b.doc_id, b.h FROM batch b WHERE NOT EXISTS
                (SELECT 1 FROM hist WHERE hist.h = b.h)),
    first_in AS (SELECT doc_id, h,
                 ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM no_hist)
    SELECT CAST((SELECT COUNT(*) FROM batch) AS BIGINT) AS n_batch,
           CAST((SELECT COUNT(*) FROM batch) - (SELECT COUNT(*) FROM no_hist) AS BIGINT)
               AS n_dup_vs_ledger,
           CAST((SELECT COUNT(*) FROM no_hist)
              - (SELECT COUNT(*) FROM first_in WHERE rn = 1) AS BIGINT) AS n_dup_in_batch,
           CAST((SELECT COUNT(*) FROM first_in WHERE rn = 1) AS BIGINT) AS n_admitted,
           CAST((SELECT SUM(doc_id) FROM first_in WHERE rn = 1) AS BIGINT) AS admitted_id_sum
    """,
)
def l_dedup_12(spark, sf):
    """Incremental dedup against a persisted fingerprint ledger — the
    shape PRODUCTION dedup actually runs: the corpus is never re-deduped
    from scratch; each ingest batch checks (1) against the accumulated
    hash ledger of everything already admitted, then (2) within itself
    (first-submission wins), and only the survivors append to both the
    corpus and the ledger. Here the ledger is REALLY round-tripped
    through parquet (written from the historical 80%, read back for the
    join) so the check proves the persisted-state path, not a same-plan
    self-join. Planted re-crawls of historical docs must die at step 1;
    planted double submissions must die at step 2; the oracle recomputes
    both sets relationally and checks the admitted id-checksum.

    Scale shape: the ledger join is a hash-partitioned LEFT ANTI on a
    32-byte key — at 100 TB the ledger is bucketed by hash so the join
    is co-located with no fact-side shuffle; the in-batch pass is a
    window over the BATCH only (increment-sized, not corpus-sized).
    Total work per ingest tracks the increment, never the corpus —
    that is the entire point of keeping the ledger."""
    from dask_xgboost_spark.scratch import scratch_dir

    docs = load(spark, sf, "documents").select("doc_id", "text")
    hist = docs.filter(F.col("doc_id") % 10 < 8)

    ledger_path = scratch_dir("dedup_ledger")
    hist.select(F.sha2("text", 256).alias("h")).distinct().write.mode(
        "overwrite"
    ).parquet(ledger_path)
    ledger = spark.read.parquet(ledger_path)

    fresh = docs.filter(F.col("doc_id") % 10 >= 8)
    recrawl = hist.filter(F.col("doc_id") < 60).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    resubmit = fresh.filter(F.col("doc_id") % 40 == 8).select(
        (F.col("doc_id") + 300000).alias("doc_id"), "text"
    )
    batch = (
        fresh.unionByName(recrawl)
        .unionByName(resubmit)
        .select("doc_id", F.sha2("text", 256).alias("h"))
    )

    no_hist = batch.join(ledger, "h", "left_anti")
    from pyspark.sql import Window

    first_in = no_hist.withColumn(
        "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    )
    admitted = first_in.filter(F.col("rn") == 1)

    n_batch = batch.count()
    n_no_hist = no_hist.count()
    return admitted.agg(
        F.lit(n_batch).cast("bigint").alias("n_batch"),
        F.lit(n_batch - n_no_hist).cast("bigint").alias("n_dup_vs_ledger"),
        (F.lit(n_no_hist) - F.count(F.lit(1))).cast("bigint").alias("n_dup_in_batch"),
        F.count(F.lit(1)).cast("bigint").alias("n_admitted"),
        F.sum("doc_id").cast("bigint").alias("admitted_id_sum"),
    )


_DEDUP13_SQL = """
WITH base AS (
    SELECT vec_id,
           list_prepend(CAST(embedding[1] AS DOUBLE),
                        list_transform(embedding[2:64],
                                       x -> CAST(x AS DOUBLE))) AS e
    FROM embeddings
),
pert AS (
    SELECT vec_id + 100000 AS vec_id,
           list_prepend(e[1] + 0.0009765625, e[2:64]) AS e
    FROM base WHERE vec_id % 25 = 0
),
allv AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
q AS (
    SELECT vec_id,
           list_transform(e, x -> CAST(FLOOR(x * 1024) AS BIGINT)) AS qv
    FROM allv
),
b AS (
    SELECT vec_id, qv,
           CAST(list_sum(list_transform(range(1, 17),
               i -> CASE WHEN qv[i] >= 0 THEN 1 << (i - 1) ELSE 0 END))
               AS BIGINT) AS bucket
    FROM q
),
pairs AS (
    SELECT a.vec_id AS a, bb.vec_id AS b,
           CAST(list_sum(list_transform(range(1, 65),
               i -> (a.qv[i] - bb.qv[i]) * (a.qv[i] - bb.qv[i])))
               AS BIGINT) AS dist2
    FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
)
SELECT a, b, dist2 FROM pairs WHERE dist2 <= 100 ORDER BY a, b
"""


@register("L-DEDUP-13", sql=_DEDUP13_SQL)
def l_dedup_13(spark, sf):
    """Embedding near-duplicate detection via SIGN-BUCKET blocking
    (SemDeDup-lite): the 16 leading sign bits of the ×1024-quantized
    vector form a deterministic 2¹⁶-bucket SimHash; candidate pairs
    are generated ONLY within a bucket (equi-join, never all-pairs)
    and verified by EXACT integer squared distance ≤ τ. This is
    L-DEDUP-05's scale path with a deterministic blocker instead of
    that entry's brute-force scan — and the embedding-space sibling of
    L-DEDUP-04's text SimHash. Near-dups are planted in-query (every
    25th vector re-appears +100000 with its first coordinate nudged
    +2⁻¹⁰), mirrored exactly by the oracle; the nudge is below one
    quantization step of the other 63 dims, so each plant lands one
    dist² unit from its source — inside τ=100, while organic random
    64-dim pairs sit orders of magnitude outside.

    Known recall edge (documented, inherent to sign blocking): a true
    near-dup pair straddling a sign boundary in one of the 16 leading
    dims lands in different buckets — production stacks R independent
    rotations/bands (L-DEDUP-02's LSH banding) to drive miss
    probability down exponentially; one band keeps this entry's
    semantics deterministic and oracle-exact.

    Scale shape: quantize+bucket are map-only; the self-join key is
    the bucket (expected occupancy n/2¹⁶ — candidate volume near-
    linear); exact verification touches candidates only."""
    to_d = F.expr(
        "concat(array(CAST(element_at(embedding, 1) AS DOUBLE)), "
        "transform(slice(embedding, 2, 63), x -> CAST(x AS DOUBLE)))"
    )
    base = load(spark, sf, "embeddings").select("vec_id", to_d.alias("e"))
    pert = base.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr(
            "concat(array(e[0] + 0.0009765625d), slice(e, 2, 63))"
        ).alias("e"),
    )
    allv = base.unionByName(pert)
    q = allv.select(
        "vec_id",
        F.expr("transform(e, x -> CAST(FLOOR(x * 1024) AS BIGINT))").alias("qv"),
    )
    b = q.withColumn(
        "bucket",
        F.expr(
            "aggregate(transform(slice(qv, 1, 16), "
            "(x, i) -> CASE WHEN x >= 0 THEN shiftleft(CAST(1 AS BIGINT), i) "
            "ELSE CAST(0 AS BIGINT) END), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ),
    )
    a = b.select(
        F.col("vec_id").alias("a"), F.col("qv").alias("qa"), "bucket"
    )
    bb = b.select(
        F.col("vec_id").alias("b"), F.col("qv").alias("qb"), "bucket"
    )
    pairs = (
        a.join(bb, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), "
                "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
            ).alias("dist2"),
        )
    )
    return pairs.filter(F.col("dist2") <= 100).orderBy("a", "b")


def _mh_hash(p: int) -> str:
    """Permutation-p MinHash value of shingle column ``g`` — a 6-char
    ascending md5 polynomial (one fragment per permutation, seeded by
    prefixing the permutation index). The polynomial itself — including
    the BIGINT-before-multiply int64 discipline — is the shared
    functions.md5_poly definition (consolidated r9, VERDICT r8 §wrong
    2); this wrapper only binds the seed and the shingle column."""
    return md5_poly(f"'{p}|' || g", 6)


_DEDUP14_DOCS = (
    "(SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 400000, text || ' extra' FROM documents "
    "WHERE doc_id < 40)"
)

_DEDUP14_SQL = f"""
WITH sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM {_DEDUP14_DOCS} d) t,
                 unnest(range(1, len(w) - 1)) AS u(i) WHERE len(w) >= 3),
sig AS (SELECT doc_id,
               {', '.join(f'MIN({_mh_hash(p)}) AS m{p}' for p in range(8))}
        FROM sh GROUP BY doc_id),
bands AS (
  {' UNION ALL '.join(
      f"SELECT doc_id, {b} AS band, CAST(m{2 * b} AS VARCHAR) || ':' || "
      f"CAST(m{2 * b + 1} AS VARCHAR) AS sig FROM sig"
      for b in range(4)
  )})
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(COUNT(*) AS BIGINT) AS n_bands
FROM bands a JOIN bands b
  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
GROUP BY d1, d2 ORDER BY d1, d2
"""


@register("L-DEDUP-14", sql=_DEDUP14_SQL)
def l_dedup_14(spark, sf):
    """HASH-MODE MinHash + banded LSH candidate generation — the
    oracle-checkable twin of L-DEDUP-02 (whose Spark-ML
    approxSimilarityJoin internals are engine-specific, so it can only
    be golden-checked on planted-dup recall). Here every stage is
    deterministic in the SQL dialect intersection: 3-word shingles →
    8 MinHash permutations (md5-polynomial hashes, one groupBy with 8
    MIN aggregates — no row explosion) → 4 bands × 2 rows → candidate
    pair per shared band value. DuckDB runs the identical pipeline, so
    the ENTIRE LSH mechanism — not just its recall — is hash-proven.
    Forty planted near-dups (one appended token) make the banding
    load-bearing at every SF.

    Scale shape: the canonical 100 TB dedup plan — one shuffle to
    doc-grain signatures, one shuffle on (band, sig) buckets; candidate
    pairs are Σ|bucket|², never corpus². Band/row split (b=4, r=2)
    tunes the usual S-curve: P(candidate) = 1-(1-j^r)^b. Verification
    (exact Jaccard on candidates only) is L-DEDUP-09's job; grouping
    into clusters is L-DEDUP-07's."""
    base = load(spark, sf, "documents").select("doc_id", "text")
    planted = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    docs = base.unionByName(planted)
    shingles = F.expr(
        "case when size(split(text, ' ')) >= 3 then "
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) "
        "else array() end"
    )
    sh = docs.select("doc_id", F.explode(shingles).alias("g")).distinct()
    sig = sh.groupBy("doc_id").agg(
        *[F.min(F.expr(_mh_hash(p))).alias(f"m{p}") for p in range(8)]
    )
    bands = sig.select(
        "doc_id",
        F.expr(
            "stack(4, "
            + ", ".join(
                f"{b}, concat(cast(m{2 * b} as string), ':', "
                f"cast(m{2 * b + 1} as string))"
                for b in range(4)
            )
            + ") as (band, sig)"
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"))
        .orderBy("d1", "d2")
    )


_DEDUP15_DOCS = (
    "(SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 400000, text || ' tail marker segment' "
    "FROM documents WHERE doc_id < 40)"
)

_DEDUP15_SQL = f"""
WITH segs AS (
  SELECT doc_id, CAST(i AS BIGINT) AS seg_idx,
         array_to_string(w[i * 8 + 1 : i * 8 + 8], ' ') AS seg
  FROM (SELECT doc_id, string_split(text, ' ') AS w
        FROM {_DEDUP15_DOCS} d) t,
       unnest(range(0, (len(w) + 7) // 8)) AS u(i)),
keep AS (
  SELECT doc_id, seg_idx, seg,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS occ
  FROM segs)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CASE WHEN SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) > 0
            THEN md5(string_agg(CASE WHEN occ = 1 THEN seg END, ' '
                                ORDER BY seg_idx))
       END AS rebuilt_md5
FROM keep GROUP BY doc_id ORDER BY doc_id
"""


def segment_dedup(docs, seg_words: int = 8):
    """First-occurrence-keep segment dedup + reconstruction over a
    ``(doc_id, text)`` frame — the public API behind L-DEDUP-15. Splits
    each doc into fixed ``seg_words``-word segments (pass newline-split
    text for true line/paragraph grain), keeps the globally first
    occurrence of each segment (min (doc_id, seg_idx)), and rebuilds
    every doc from its surviving segments in original order. Returns
    one row per doc: n_segs, n_kept, rebuilt_md5 (NULL when nothing
    survives)."""
    docs = docs.withColumn("w", F.split("text", " "))
    segs = docs.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr(f"CAST((size(w) + {seg_words - 1}) div {seg_words} AS INT) - 1"),
            )
        ).alias("i"),
        F.col("w"),
    ).select(
        "doc_id",
        F.col("i").cast("bigint").alias("seg_idx"),
        F.array_join(
            F.expr(f"slice(w, i * {seg_words} + 1, {seg_words})"), " "
        ).alias("seg"),
    )
    occ = F.row_number().over(
        Window.partitionBy("seg").orderBy("doc_id", "seg_idx")
    )
    keep = segs.withColumn("occ", occ)
    kept_flag = F.when(F.col("occ") == 1, 1).otherwise(0)
    rebuilt = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("occ") == 1, F.struct("seg_idx", "seg"))
                )
            ),
            lambda s: s.seg,
        ),
        " ",
    )
    return (
        keep.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.sum(kept_flag).cast("long").alias("n_kept"),
            F.md5(rebuilt).alias("_rb"),
        )
        .select(
            "doc_id",
            "n_segs",
            "n_kept",
            F.when(F.col("n_kept") > 0, F.col("_rb")).alias("rebuilt_md5"),
        )
        .orderBy("doc_id")
    )


@register("L-DEDUP-15", sql=_DEDUP15_SQL)
def l_dedup_15(spark, sf):
    """FIRST-OCCURRENCE-KEEP segment-level dedup with document
    reconstruction — the RefinedWeb exact line-dedup rule, distinct
    from L-DEDUP-10's C4 rule (which drops EVERY copy of a boilerplate
    line past a document-frequency threshold): here the globally first
    occurrence (min (doc_id, seg_idx)) of each segment SURVIVES and
    only later copies are cut, then every document is re-assembled
    from its surviving segments in original order. Segments are fixed
    8-word blocks (the fixture soup has no newline/paragraph structure;
    production passes split(text, '\\n') at the same grain). Clones
    planted in-query (doc_id+400000, text plus a novel tail) mirror the
    oracle exactly: a clone keeps only its tail segment, the original
    keeps everything. Output is the reconstruction contract per doc:
    segment counts and the md5 of the rebuilt text (NULL when nothing
    survives, matching string_agg-over-empty semantics).

    Scale shape: segment explode is map-side (bounded ×n_segs); ONE
    shuffle on the segment string for the first-occurrence window
    (partitioned by segment — never global); ONE shuffle back on
    doc_id for reconstruction. Both keys are high-cardinality at
    corpus scale; the segment string key can be md5'd to bound shuffle
    width (same rows, narrower bytes)."""
    base = load(spark, sf, "documents").select("doc_id", "text")
    planted = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail marker segment")).alias("text"),
    )
    return segment_dedup(base.unionByName(planted))
