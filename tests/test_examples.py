"""Each example script's main() must run end-to-end on the small fixture
— examples are user-facing documentation and rot silently otherwise."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMALL


@pytest.mark.parametrize(
    "module", ["reference_workflow", "curation_pipeline", "similarity_search", "warehouse_ops"]
)
def test_example_runs(module, spark):
    mod = importlib.import_module(f"examples.{module}")
    mod.main(SF_SMALL)
