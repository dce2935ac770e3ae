"""Direct contract tests for the shared expression helpers in
dask_xgboost_spark.functions — the md5_poly fragment is the single
audited definition behind every engine-neutral deterministic hash in
the repo (consolidated r9, VERDICT r8), so its emission and its
cross-engine value identity get their own pins in addition to the
operator-level oracle sweep."""

from __future__ import annotations

from dask_xgboost_spark.functions import md5_poly


def test_md5_poly_emission_contract():
    # n=1: a single BIGINT-cast ascii term, parenthesized, no '* 1'
    assert md5_poly("x", 1) == (
        "(CAST(ascii(substr(md5(x), 1, 1)) AS BIGINT))"
    )
    # ascending (MinHash convention): coefficient 31^i on char i+1,
    # unit coefficient omitted on the FIRST term
    asc = md5_poly("x", 3)
    assert asc == (
        "(CAST(ascii(substr(md5(x), 1, 1)) AS BIGINT)"
        " + CAST(ascii(substr(md5(x), 2, 1)) AS BIGINT) * 31"
        " + CAST(ascii(substr(md5(x), 3, 1)) AS BIGINT) * 961)"
    )
    # descending (score convention): highest power on char 1, unit
    # coefficient omitted on the LAST term — byte-identical to the
    # pre-consolidation _cal_raw emission
    desc = md5_poly("CAST(o_orderkey AS VARCHAR)", 3, descending=True)
    assert desc == (
        "(CAST(ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) AS BIGINT) * 961"
        " + CAST(ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) AS BIGINT) * 31"
        " + CAST(ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 3, 1)) AS BIGINT))"
    )
    # every multiplicand is BIGINT-cast BEFORE its coefficient — the
    # int64 overflow discipline the helper exists to centralize
    # (31^5 * 127 > 2^31; an int32 product would silently wrap in
    # Spark with ANSI off)
    six = md5_poly("x", 6)
    assert six.count("AS BIGINT") == 6
    assert f"* {31 ** 5}" in six


def test_md5_poly_cross_engine_values(spark, duck):
    """The SAME fragment text evaluates to the SAME integers in Spark
    SQL and DuckDB for every order and length — the dialect-
    intersection property every call site relies on."""
    frags = [
        md5_poly("'7|' || 'abc def'", 6),
        md5_poly("'x'", 1),
        # STRING is the one cast spelling BOTH dialects accept (DuckDB
        # aliases it to VARCHAR); operators pass the dialect-specific
        # spelling per side, but shared-text probes must intersect
        md5_poly("CAST(12345 AS STRING)", 3, descending=True),
    ]
    sel = ", ".join(f"{f} AS c{i}" for i, f in enumerate(frags))
    spark_row = spark.sql(f"SELECT {sel}").collect()[0]
    duck_row = duck.execute(f"SELECT {sel}").fetchone()
    assert tuple(spark_row) == tuple(duck_row)
