"""The rotation tool's proposed window must satisfy the same structural
invariants tests/test_driver_window.py enforces on the shipped window —
so a future round can trust its output as a starting point."""

from __future__ import annotations

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dask_xgboost_spark.registry import load_all  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "rotate_window",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "rotate_window.py"),
)
rotate_window = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rotate_window)


def test_proposed_window_satisfies_driver_invariants():
    specs = load_all()
    window, spillover, report = rotate_window.propose(50)
    # exactly the window size, no duplicates, all names resolve
    assert len(window) == 50 == len(set(window))
    assert all(n in specs for n in window)
    # window + spillover cover the registry exactly once
    assert sorted(window + spillover) == sorted(specs)
    # family coverage (the driver-window test's required set)
    fams = {rotate_window.family(n) for n in window}
    for f in rotate_window.REQUIRED_FAMILIES:
        assert f in fams, f
    # hash-mode quota
    n_hash = sum(1 for n in window if specs[n].sql is not None)
    assert n_hash >= rotate_window.MIN_HASH_MODE
    # staleness actually drains: the window's oldest witness equals the
    # registry's oldest witness (nothing staler is left out unless the
    # whole cohort exceeds the window)
    latest = rotate_window.latest_witness()
    oldest_all = min(latest.values())
    assert report["oldest_round_in_window"] == oldest_all
    # lifetime coverage: no never-witnessed entry is left to spillover
    # while the window still has headroom of its kind — golden/tol
    # entries are capped only by the non-hash budget; hash-mode entries
    # (ops added since the last driver round) are capped only by the
    # window itself
    never = [n for n in specs if n not in latest]
    spilled_never = [n for n in never if n not in window]
    non_hash_budget = 50 - rotate_window.MIN_HASH_MODE
    n_non_hash = sum(1 for n in window if specs[n].sql is None)
    spilled_never_nonhash = [n for n in spilled_never if specs[n].sql is None]
    assert not (spilled_never_nonhash and n_non_hash < non_hash_budget), (
        spilled_never_nonhash, n_non_hash
    )
    assert not [n for n in spilled_never if specs[n].sql is not None], (
        "hash-mode never-witnessed entries must always be windowed"
    )
