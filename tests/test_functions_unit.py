"""Direct contract tests for the shared expression helpers in
dask_xgboost_spark.functions — the md5_poly fragment is the single
audited definition behind every engine-neutral deterministic hash in
the repo (consolidated r9, VERDICT r8), so its emission and its
cross-engine value identity get their own pins in addition to the
operator-level oracle sweep."""

from __future__ import annotations

import pytest

from dask_xgboost_spark.functions import hex_nibbles, md5_poly


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


def test_hex_nibbles_emission_contract():
    # n=1: one nibble decode — BIGINT-cast ascii minus the hex-alpha
    # offset CASE, parenthesized, no coefficient on the unit term
    one = hex_nibbles("hx", 1, 1)
    assert one == (
        "((CAST(ascii(substr(hx, 1, 1)) AS BIGINT) - "
        "CASE WHEN ascii(substr(hx, 1, 1)) >= 97 THEN 87 ELSE 48 END))"
    )
    # big-endian: char at `start` carries 16^(n-1); last char is unit
    two = hex_nibbles("hx", 3, 2)
    assert "substr(hx, 3, 1)" in two and "substr(hx, 4, 1)" in two
    assert two.index("substr(hx, 3, 1)") < two.index("substr(hx, 4, 1)")
    assert " * 16 + " in two  # 16^1 on the first term, unit on the last
    assert not two.rstrip(")").endswith("* 1")
    # int64 discipline: every nibble BIGINT-cast before its coefficient,
    # and the 15-char bound (16^15 = 2^60 < 2^63) is enforced
    full = hex_nibbles("hx", 1, 15)
    assert full.count("AS BIGINT") == 15
    assert f"* {16 ** 14}" in full
    with pytest.raises(AssertionError):
        hex_nibbles("hx", 1, 16)
    with pytest.raises(AssertionError):
        hex_nibbles("hx", 0, 4)


def test_hex_nibbles_rank_math_matches_python(duck):
    """Property check of the HLL rank construction built ON hex_nibbles
    (Q-AGG-27's CASE/BIN/LENGTH fragment) against an independent pure-
    Python reference: for arbitrary input strings, bucket = first-byte
    mod 64 and rank = 57 - (56-bit remainder).bit_length(), with the
    zero remainder mapping to the max rank 57. DuckDB-only (no JVM): the
    Spark/DuckDB value identity is pinned by the cross-engine test
    above; this one pins the MATH."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dask_xgboost_spark.operators.relational import (
        _A27_BUCKET,
        _A27_RANK,
        _A27_WBITS,
    )

    @settings(max_examples=50, deadline=None)
    @given(st.text(min_size=0, max_size=40))
    def check(s):
        row = duck.execute(
            f"SELECT {_A27_BUCKET} AS bucket, {_A27_RANK} AS rank FROM "
            f"(SELECT {_A27_WBITS} AS w, hx FROM (SELECT md5(?) AS hx))",
            [s],
        ).fetchone()
        h = hashlib.md5(s.encode()).hexdigest()
        want_bucket = int(h[:2], 16) % 64
        w = int(h[2:16], 16)
        want_rank = 57 - w.bit_length() if w else 57
        assert (row[0], row[1]) == (want_bucket, want_rank), (s, row)

    check()


def test_hex_nibbles_cross_engine_values(spark, duck):
    """Same fragment text → same integers in both engines, and both
    equal Python's int(hex_slice, 16) ground truth — the uniformity
    claim (exact base-16 decode) verified at the value level."""
    import hashlib

    samples = ["", "0", "42", "a b|c", "12345"]
    for s in samples:
        hx = hashlib.md5(s.encode()).hexdigest()
        for start, n in ((1, 2), (3, 14), (1, 8), (5, 1)):
            frag = hex_nibbles("hx", start, n)
            q = f"SELECT {frag} AS v FROM (SELECT md5('{s}') AS hx) AS t"
            got_spark = spark.sql(q).collect()[0]["v"]
            got_duck = duck.execute(q).fetchone()[0]
            want = int(hx[start - 1 : start - 1 + n], 16)
            assert got_spark == got_duck == want, (s, start, n)
