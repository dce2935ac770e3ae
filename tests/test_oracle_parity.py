"""The t2 gate, run locally: every hash/stream-mode spec in the registry
must hash-match its DuckDB oracle at the test scale factor."""

from __future__ import annotations

import pytest

from dask_xgboost_spark.registry import load_all
from tests.oracle import compare

SPECS = load_all()
HASH_SPECS = sorted(n for n, s in SPECS.items() if s.sql is not None)


@pytest.mark.parametrize("name", HASH_SPECS)
def test_oracle_parity(name, spark, duck, sf_dir):
    spec = SPECS[name]
    try:
        result = compare(spec.fn(spark, sf_dir), duck, spec.sql)
    finally:
        # some operators persist() small multi-referenced intermediates;
        # drop them so a 248-entry single-session sweep doesn't
        # accumulate cache entries (ADVICE r4)
        spark.catalog.clearCache()
    assert result["match"], f"{name}: {result}"
