"""Rows-only smoke sweep over every NO-ORACLE registry entry — the
repo-local mirror of the driver's weaker check for golden/tol specs.

test_oracle_parity.py executes every hash-mode spec; without this file a
golden-mode fn could break (schema drift, fixture drift, bad import) and
nothing local would notice until the driver ran it — exactly the r3
failure mode. Runs at sf0.001 so the ML fits stay cheap."""

from __future__ import annotations

import pytest

from dask_xgboost_spark.registry import load_all
from tests.conftest import SF_SMALL

SPECS = load_all()
GOLDEN = sorted(n for n, s in SPECS.items() if s.sql is None)


@pytest.mark.parametrize("name", GOLDEN)
def test_golden_spec_runs(name, spark):
    df = SPECS[name].fn(spark, SF_SMALL)
    # schema must be concrete and the query must execute end-to-end
    assert df.schema.fields, name
    assert df.count() >= 0, name
