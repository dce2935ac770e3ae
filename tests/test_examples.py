"""Each example script must run end-to-end on the small fixture —
examples are user-facing documentation and rot silently otherwise.

Run as SUBPROCESSES, exactly as a user would (`python examples/x.py`):
the scripts own their SparkSession lifecycle (including spark.stop()),
so running them in-process would tear down the suite's session-scoped
fixture for every later test module."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from tests.conftest import SF_SMALL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# script-specific stdout markers: lines a script must actually print
# (a tour that silently skipped a step would otherwise still pass).
# reliable_serving step 6 is the release_rollups() lifecycle demo
# (VERDICT r9 item 6): the long-lived session must release the
# package's persisted rollups and leave the JVM cache empty.
EXPECT_STDOUT = {
    "reliable_serving.py": ["rollups released, cache empty: True"],
    # sketch_rollups' whole point is the lossless-merge identity; a run
    # that skipped the asserts would still exit 0 without these lines
    "sketch_rollups.py": [
        "HLL register merge exact: True",
        "CMS counter merge exact: True",
        "histogram merge exact: True",
        "CMS one-sided after merge: True",
    ],
}


@pytest.mark.parametrize(
    "script",
    [
        "reference_workflow.py",
        "curation_pipeline.py",
        "similarity_search.py",
        "warehouse_ops.py",
        "python_extensions.py",
        "geo_analytics.py",
        "governance_gates.py",
        "reliable_serving.py",
        "product_analytics.py",
        "multimodal_pipeline.py",
        "lakehouse_ops.py",
        "model_evaluation.py",
        "scale_diagnostics.py",
        "retrieval_training_data.py",
        "sketch_rollups.py",
    ],
)
def test_example_runs(script):
    proc = subprocess.run(
        [sys.executable, os.path.join("examples", script), SF_SMALL],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout: {proc.stdout[-2000:]}\n"
        f"stderr: {proc.stderr[-2000:]}"
    )
    for marker in EXPECT_STDOUT.get(script, []):
        assert marker in proc.stdout, (
            f"{script} did not print {marker!r}\n"
            f"stdout: {proc.stdout[-2000:]}"
        )
