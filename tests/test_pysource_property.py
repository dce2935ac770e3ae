"""Property-based checks for the round-4 Python-boundary surfaces:

- the custom ``pyjsonl`` Python Data Source must round-trip arbitrary
  records (unicode, nulls, absent keys) identically to what was written;
- VARIANT extraction (``parse_json``/``variant_get``) must agree with
  Python's ``json`` module on arbitrary JSON payloads — independent
  implementations of the same contract.
"""

from __future__ import annotations

import json
import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs",), exclude_characters="\r\n"
    ),
    max_size=40,
)
_record = st.fixed_dictionaries(
    {"doc_id": st.integers(min_value=0, max_value=10**12)},
    optional={
        "lang": st.one_of(st.none(), _text),
        "text": st.one_of(st.none(), _text),
    },
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_record, min_size=1, max_size=20))
def test_pyjsonl_roundtrips_arbitrary_records(spark, records):
    from dask_xgboost_spark.sources.pydatasource import register_python_sources

    register_python_sources(spark)
    base = tempfile.mkdtemp(prefix="dxs_pysrc_prop")
    # split across 2 files to exercise multi-partition reads
    half = (len(records) + 1) // 2
    for i, chunk in enumerate((records[:half], records[half:])):
        with open(os.path.join(base, f"part-{i:05d}.json"), "w") as fh:
            for rec in chunk:
                fh.write(json.dumps(rec, ensure_ascii=False) + "\n")
    got = (
        spark.read.format("pyjsonl")
        .schema("doc_id bigint, lang string, text string")
        .option("path", base)
        .load()
        .collect()
    )
    def key(t):
        # None-safe total order (duplicate doc_ids with mixed None/str
        # fields would make bare tuple sort raise TypeError)
        return tuple((v is None, v if v is not None else "") for v in t)

    want = sorted(
        ((r["doc_id"], r.get("lang"), r.get("text")) for r in records), key=key
    )
    assert sorted(((r.doc_id, r.lang, r.text) for r in got), key=key) == want


_json_scalar = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    _text,
)
_payload = st.fixed_dictionaries(
    {},
    optional={
        "k": _json_scalar,
        "nested": st.fixed_dictionaries({"x": st.integers(-100, 100)}),
        "arr": st.lists(st.integers(-5, 5), max_size=4),
    },
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_payload, min_size=1, max_size=16))
def test_variant_extraction_matches_python_json(spark, payloads):
    rows = [(i, json.dumps(p, ensure_ascii=False)) for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "i int, props string")
    v = F.parse_json("props")
    got = (
        df.select(
            "i",
            F.try_variant_get(v, "$.k", "string").alias("k_str"),
            F.try_variant_get(v, "$.nested.x", "int").alias("nx"),
            F.try_variant_get(v, "$.arr[0]", "int").alias("a0"),
        )
        .orderBy("i")
        .collect()
    )
    for row, p in zip(got, payloads):
        k = p.get("k")
        if k is None:
            assert row.k_str is None
        elif isinstance(k, bool):
            assert row.k_str == ("true" if k else "false")
        else:
            assert row.k_str == str(k)
        nested = p.get("nested")
        assert row.nx == (nested["x"] if nested is not None else None)
        arr = p.get("arr")
        assert row.a0 == (arr[0] if arr else None)


_doc_text = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=4), min_size=1, max_size=80
).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_doc_text, min_size=1, max_size=6))
def test_chunking_matches_python_reference(spark, texts):
    """L-TEXT-18's window/stride arithmetic against an independent pure-
    Python reference: chunks tile every document with stride-24 starts,
    32-token windows, final partial chunk included, 8-token overlap
    between neighbors."""
    W, S = 32, 24

    def ref_chunks(text):
        toks = text.split(" ")
        n = len(toks)
        n_chunks = max(-(-(n - W) // S), 0) + 1  # ceil for ints
        out = []
        for ci in range(n_chunks):
            window = toks[ci * S : ci * S + W]
            out.append((ci, " ".join(window), len(window)))
        return out

    from dask_xgboost_spark.registry import load_all  # noqa: F401 (side import)
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = F2.split("text", " ")
    n_chunks = F2.greatest(
        F2.ceil((F2.size(toks) - F2.lit(W)) / F2.lit(float(S))), F2.lit(0)
    ).cast("int") + F2.lit(1)
    chunks = F2.transform(
        F2.sequence(F2.lit(0), n_chunks - 1),
        lambda ci: F2.struct(
            ci.alias("ci"),
            F2.array_join(F2.slice(toks, ci * S + 1, W), " ").alias("chunk"),
            F2.least(F2.size(toks) - ci * S, F2.lit(W)).alias("chunk_len"),
        ),
    )
    got = (
        df.select("doc_id", F2.explode(chunks).alias("c"))
        .select("doc_id", "c.ci", "c.chunk", "c.chunk_len")
        .orderBy("doc_id", "ci")
        .collect()
    )
    want = [
        (i, ci, chunk, ln)
        for i, t in enumerate(texts)
        for ci, chunk, ln in ref_chunks(t)
    ]
    assert [(r.doc_id, r.ci, r.chunk, r.chunk_len) for r in got] == want


def test_pyjsonl_writer_publishes_all_or_nothing(spark, tmp_path):
    """Transactional sink contract: a job with a failing task must
    publish NOTHING (staged files never become reader-visible), and a
    successful retry of the same job publishes exactly once."""
    import pytest
    from pyspark.sql import functions as F

    from dask_xgboost_spark.sources.pydatasource import register_python_sources

    register_python_sources(spark)
    out = str(tmp_path / "sink")
    df = spark.range(100).repartition(4).select(
        F.col("id").alias("doc_id"),
        F.lit("en").alias("lang"),
        F.lit("t").alias("text"),
    )

    @F.udf("string")
    def boom(lang):
        raise RuntimeError("injected task failure")

    with pytest.raises(Exception):
        df.withColumn("lang", boom("lang")).write.format("pyjsonl").option(
            "path", out
        ).mode("append").save()
    back_schema = "doc_id bigint, lang string, text string"
    read = lambda: (  # noqa: E731
        spark.read.format("pyjsonl").schema(back_schema).option("path", out).load()
    )
    import os

    if os.path.isdir(out):
        assert read().count() == 0, "failed job must publish nothing"
        assert all(f.endswith(".staged") or not f.endswith(".json")
                   for f in os.listdir(out))

    df.write.format("pyjsonl").option("path", out).mode("overwrite").save()
    assert read().count() == 100
