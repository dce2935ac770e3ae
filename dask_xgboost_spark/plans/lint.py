"""Physical-plan linter: flag the patterns that kill jobs at 100 TB.

A query that is correct at sf0.01 and catastrophic at cluster scale
usually telegraphs it in the physical plan — a Cartesian product, a
row-at-a-time Python UDF inside the scan-heavy stage, a parquet scan
whose predicate never reached the reader. ``lint_plan`` inspects a
DataFrame's (executed) plan and returns structured findings, so
pipelines can gate deployment on an empty finding list the same way
they gate on tests. Heuristics operate on the plan text Spark itself
prints — no private APIs.

Severities: ``error`` = will not survive a 100× scale-up;
``warn`` = costs real money at scale, sometimes legitimate;
``info`` = worth a look.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    severity: str  # error | warn | info
    code: str
    message: str


def _formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def lint_plan(df: DataFrame, max_exchanges: int = 4) -> list[Finding]:
    """Lint a DataFrame's physical plan for scale anti-patterns.

    Checks (each maps to a Finding code):

    - ``CARTESIAN``: CartesianProduct / BroadcastNestedLoopJoin — O(n·m)
      row pairing; at fact-table sizes this never finishes. (Broadcast
      NLJ is legitimate ONLY for tiny broadcast sides, e.g. L-SIM-01's
      query set — suppress by passing that expectation explicitly.)
    - ``PYTHON_UDF``: BatchEvalPython (row-at-a-time Python) in the
      plan — 10-100× slower than Arrow-batched evaluation; ArrowEvalPython
      (pandas UDFs) is reported as info only.
    - ``NO_PUSHDOWN``: a parquet scan with an empty PushedFilters list
      while a Filter node sits in the same plan — the predicate is being
      applied AFTER decode instead of inside the reader. (Heuristic:
      filters on derived columns genuinely can't push — review, don't
      panic.)
    - ``MANY_EXCHANGES``: more than ``max_exchanges`` shuffle Exchanges —
      usually a missed co-partitioning or a plan that should reuse one
      repartition across stages.
    - ``NO_CODEGEN``: no WholeStageCodegen span at all — the hot path is
      running interpreted.
    - ``GLOBAL_WINDOW``: a Window operator fed by an Exchange
      SinglePartition — an unpartitioned window funnels the whole input
      through ONE task. Legitimate only on provably bounded frames (a
      top-K vocabulary, a LIMITed rank assignment); fatal on unbounded
      data.
    """
    plan = _formatted_plan(df)
    findings: list[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding(
                "error",
                "CARTESIAN",
                "CartesianProduct in plan: unbounded row pairing — add a join "
                "key, or broadcast + filter if one side is provably tiny.",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        # codegen markers and tree structure only print in the
        # executed-plan string (same reason the GLOBAL_WINDOW walk
        # uses it below)
        executed_for_bnlj = df._jdf.queryExecution().executedPlan().toString()
        if _bnlj_builds_all_scalar_agg(executed_for_bnlj):
            findings.append(
                Finding(
                    "info",
                    "BNLJ_SCALAR",
                    "BroadcastNestedLoopJoin whose every build side is a "
                    "grouping-key-less aggregate (provably one broadcast "
                    "row — the attach-global-totals/bounds pattern): "
                    "scale-safe by construction.",
                )
            )
        else:
            findings.append(
                Finding(
                    "warn",
                    "CARTESIAN_BNLJ",
                    "BroadcastNestedLoopJoin: every probe row scans the whole "
                    "broadcast side — fine for a tiny broadcast (top-k query "
                    "sets), fatal if the broadcast side grows with the data.",
                )
            )
    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "error",
                "PYTHON_UDF",
                "Row-at-a-time Python UDF (BatchEvalPython): move the logic "
                "to built-in functions or an Arrow-batched pandas UDF.",
            )
        )
    if "ArrowEvalPython" in plan:
        findings.append(
            Finding(
                "info",
                "ARROW_UDF",
                "Arrow-batched Python present: acceptable off the hot path; "
                "prefer built-in functions where expressible.",
            )
        )

    # scans whose PushedFilters carry no real predicate (empty or only the
    # IsNotNull side-conditions Spark always derives) while a Filter node
    # still evaluates rows post-decode
    # tree lines look like "* Filter (3)" / "+- Filter (5)"
    has_filter_node = re.search(r"\bFilter \(\d+\)", plan) is not None
    pushed_lists = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    trivial_pushed = any(
        not any(
            part.strip() and not part.strip().startswith("IsNotNull")
            for part in lst.split(",")
        )
        for lst in pushed_lists
    )
    if has_filter_node and pushed_lists and trivial_pushed:
        findings.append(
            Finding(
                "warn",
                "NO_PUSHDOWN",
                "A scan has PushedFilters: [] while the plan filters rows — "
                "the predicate is evaluated after decode. If the filter is on "
                "a stored column, restructure so it reaches the reader.",
            )
        )

    n_exchanges = len(re.findall(r"\bExchange\b", plan.split("\n\n")[0]))
    if n_exchanges > max_exchanges:
        findings.append(
            Finding(
                "info",
                "MANY_EXCHANGES",
                f"{n_exchanges} shuffle Exchanges: check for a reusable "
                "partitioning (bucketing / repartition once, consume twice).",
            )
        )

    # codegen markers ("*(n)") only appear in the executed-plan string,
    # not in formatted explain
    executed = df._jdf.queryExecution().executedPlan().toString()

    # GLOBAL_WINDOW must check ADJACENCY, not co-occurrence: an unrelated
    # scalar-subquery global aggregate also plans an Exchange
    # SinglePartition, and flagging every plan containing both would cry
    # wolf (e.g. key-partitioned gapfill windows + a MIN/MAX-bounds
    # subquery). Walk the executed-plan tree: from each Window line, the
    # first Exchange among its (deeper-indented) descendants is the one
    # feeding it; flag only when that Exchange is SinglePartition.
    if _window_fed_by_single_partition(executed):
        findings.append(
            Finding(
                "warn",
                "GLOBAL_WINDOW",
                "Window fed by an Exchange SinglePartition: the whole input "
                "serializes through one task. Acceptable only when the "
                "windowed frame is provably bounded (top-K, LIMITed) — "
                "partition the window otherwise.",
            )
        )
    if "*(" not in executed:
        findings.append(
            Finding(
                "info",
                "NO_CODEGEN",
                "No WholeStageCodegen span: the plan runs interpreted — "
                "usually a UDF/UDTF or an exotic operator breaking fusion.",
            )
        )
    return findings


def assert_scales(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()) -> None:
    """Raise if the plan has error-severity findings (codes in ``allow``
    are suppressed) — the deploy-gate form of :func:`lint_plan`."""
    bad = [
        f
        for f in lint_plan(df)
        if f.severity == "error" and f.code not in allow
    ]
    if bad:
        raise AssertionError(
            "plan fails scale lint:\n" + "\n".join(f"  [{f.code}] {f.message}" for f in bad)
        )


def _tree_indent(line: str) -> int:
    """Depth of a node line in executedPlan().toString() — the count of
    leading tree-glyph characters (spaces, ':', '+', '-'); the node text
    (including a codegen '*(n)' prefix) starts right after them."""
    return len(line) - len(line.lstrip(" :+-"))


# A BNLJ build side is "provably bounded" only when its limit constant
# is small enough to broadcast-and-loop safely; 100k rows is generous
# for a broadcast (Spark's own autoBroadcast default is ~10 MB) while
# still refusing the limit(10_000_000) footgun.
_BNLJ_BOUNDED_ROWS = 100_000


def _limit_node_rows(line: str) -> float:
    """Parse the row bound a limit-type plan node guarantees, or +inf
    when no constant parses (keeps the caller's conservative warn).
    Shapes: ``TakeOrderedAndProject(limit=100, …)``, ``GlobalLimit 64``,
    ``CollectLimit 21``, ``Range (0, 5000, step=1, …)``."""
    m = re.search(r"TakeOrderedAndProject\(limit=(\d+)", line)
    if m:
        return int(m.group(1))
    m = re.search(r"\b(?:GlobalLimit|CollectLimit)\s+(\d+)", line)
    if m:
        return int(m.group(1))
    # start/end/step may print as negative literals (spark.range(-5, 5)
    # is a legitimate bounded spine — ADVICE r8); the ceil-division
    # arithmetic below already handles any sign combination.
    m = re.search(r"\bRange \((-?\d+), (-?\d+), step=(-?\d+)", line)
    if m:
        start, end, step = (int(g) for g in m.groups())
        return max(0, -(-(end - start) // step)) if step else float("inf")
    return float("inf")


def _bnlj_builds_all_scalar_agg(tree: str) -> bool:
    """True when EVERY BroadcastNestedLoopJoin node in the executed-plan
    tree builds from a side that is bounded BY CONSTRUCTION at any data
    size: a grouping-key-less aggregate (the
    ``crossJoin(broadcast(df.agg(...)))`` attach-a-global-scalar
    pattern, provably one row), a literal ``spark.range(n)`` spine
    (Range only ever prints constant bounds), or a LIMITed frame
    (TakeOrderedAndProject / GlobalLimit / CollectLimit — the limit is
    a plan constant, and it must PARSE BELOW ``_BNLJ_BOUNDED_ROWS``:
    a limit(10_000_000) build is a plan constant but not a broadcast-
    safe one, so an unparseable or over-threshold constant keeps the
    warn). Walk: from each BNLJ line, its DIRECT children
    print one indent level deeper; the build side starts at the
    direct-child BroadcastExchange, and is bounded when the first
    Aggregate line under that exchange prints ``keys=[]``, or a
    Range/limit node appears before any Aggregate. A ReusedExchange
    build (its source subtree prints elsewhere) or any other build
    shape returns False — the caller keeps the conservative warn."""
    lines = tree.split("\n")
    try:
        cut = next(i for i, l in enumerate(lines) if "== Initial Plan ==" in l)
        lines = lines[:cut]
    except StopIteration:
        pass
    found_any = False
    for i, line in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in line:
            continue
        found_any = True
        base = _tree_indent(line)
        scalar = False
        j = i + 1
        while j < len(lines) and (
            not lines[j].strip() or _tree_indent(lines[j]) > base
        ):
            lj = lines[j]
            if (
                _tree_indent(lj) == base + 3
                # a finalized AQE plan wraps the exchange in a
                # BroadcastQueryStage at the direct-child level; accept
                # either so post-collect lints can still downgrade
                and ("BroadcastExchange" in lj or "BroadcastQueryStage" in lj)
                and "ReusedExchange" not in lj
            ):
                bbase = _tree_indent(lj)
                k = j + 1
                while k < len(lines) and (
                    not lines[k].strip() or _tree_indent(lines[k]) > bbase
                ):
                    if "Aggregate" in lines[k]:
                        scalar = "keys=[]" in lines[k]
                        break
                    if re.search(
                        r"\bRange \(|\bTakeOrderedAndProject\b"
                        r"|\bGlobalLimit\b|\bCollectLimit\b",
                        lines[k],
                    ):
                        scalar = _limit_node_rows(lines[k]) <= _BNLJ_BOUNDED_ROWS
                        break
                    k += 1
                break
            j += 1
        if not scalar:
            return False
    return found_any


def _window_fed_by_single_partition(tree: str) -> bool:
    """True when a Window node's input chain reaches an Exchange whose
    partitioning is SinglePartition (tree = executedPlan().toString();
    a node's single input child prints on the following lines, so the
    FIRST Exchange printed after a Window line is the one feeding it —
    a later Exchange re-partitions upstream of that and cannot be the
    window's direct input)."""
    lines = tree.split("\n")
    # Only a SHUFFLE exchange can feed a Window's partitioning;
    # BroadcastExchange / ReusedExchange lines also contain "Exchange"
    # and must not terminate the walk (a single-partition feed hidden
    # behind a broadcast-join branch would otherwise go unseen). AQE
    # plan text prints the final plan first ("AdaptiveSparkPlan
    # isFinalPlan=true" then "+- == Initial Plan =="); stop at the
    # initial-plan marker so the pre-adaptive section is not re-scanned.
    shuffle_exchange = re.compile(
        r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)"
    )
    try:
        cut = next(i for i, l in enumerate(lines) if "== Initial Plan ==" in l)
        lines = lines[:cut]
    except StopIteration:
        pass
    for i, line in enumerate(lines):
        if not re.search(r"\bWindow\b", line):
            continue
        for nxt in lines[i + 1:]:
            m = shuffle_exchange.search(nxt)
            if m:
                if "SinglePartition" in nxt:
                    return True
                break
    return False


# Oracle dtype discipline (VERDICT r4 §wrong 1-2) ---------------------------
#
# DuckDB types an aggregate/windowed SUM over BIGINT as HUGEINT (int128).
# The driver's correctness harness fetches oracle results through pandas
# (`fetchdf()`), which renders HUGEINT as float64 — "1.0" against Spark's
# "1" — so an oracle whose output schema contains HUGEINT hash-mismatches
# even when every value agrees. The repo's own Arrow-path harness converts
# HUGEINT to decimal ("1") and stays green, which is exactly how Q-WIN-08
# shipped red in round 4 while the local sweep passed. These helpers make
# the trap un-reintroducible: DESCRIBE the oracle (plans it, never runs
# it) and reject any 128-bit output column.

_UNHASHABLE_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "INT128")


def lint_oracle_types(con, sql: str) -> list[Finding]:
    """DESCRIBE ``sql`` on a DuckDB connection with the fixture views
    registered; flag output columns whose type a pandas fetch path
    renders lossily (HUGEINT → float64). Fix at the source: wrap the
    offending aggregate in ``CAST(... AS BIGINT)``."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    findings = []
    for name, dtype, *_ in rows:
        up = str(dtype).upper()
        if any(t in up for t in _UNHASHABLE_DUCK_TYPES):
            findings.append(
                Finding(
                    "error",
                    "ORACLE_HUGEINT",
                    f"oracle output column {name!r} is {dtype}: DuckDB's pandas "
                    "fetch renders it float64 and the driver hash-mismatches; "
                    "CAST the aggregate to BIGINT",
                )
            )
        # The r7 Q-AGG-26 trap: the verification harness canonicalizes
        # with a plain pandas sort_values over raw columns, which
        # throws `unhashable type: numpy.ndarray` on list/map/struct
        # cells. Hash mode requires schema parity, so gating the
        # ORACLE's output type also gates the Spark side: any
        # window-eligible entry must final-project nested columns to a
        # canonical string (array_join / string_agg ORDER BY).
        # `[\d*]` also catches DuckDB FIXED-SIZE arrays (INTEGER[3],
        # DOUBLE[64] — e.g. array_value() or the embeddings fixture),
        # which fetch as ndarray cells exactly like LIST types do
        if re.search(r"\[\d*\]", up) or up.startswith(
            ("MAP(", "STRUCT(", "UNION(")
        ):
            findings.append(
                Finding(
                    "error",
                    "ORACLE_NESTED",
                    f"oracle output column {name!r} is {dtype}: the driver's "
                    "pandas canonicalizer cannot sort/hash nested cells — "
                    "final-project to a '|'-joined string in BOTH engines",
                )
            )
    return findings
