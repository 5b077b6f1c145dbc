"""Physical-plan inspection: the ".explain and iterate" loop as code.

These predicates let operator authors (and the plan-quality test
suite) assert the properties that matter at 100 TB — filters reached
the scan, small sides broadcast, no accidental extra shuffles —
instead of eyeballing explain output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (pre-execution; AQE plans show the
    initial physical plan). Scan metadata (PushedFilters/ReadSchema)
    is truncated at spark.sql.maxMetadataStringLength — raise it
    while rendering so predicates can parse complete lists."""
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.maxMetadataStringLength", "100")
    conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        try:
            return df._jdf.queryExecution().executedPlan().toString()
        except AttributeError:
            # Spark Connect: no _jdf; the server-rendered explain
            # string is the portable equivalent
            return explain_string(df, "simple")
    finally:
        conf.set("spark.sql.maxMetadataStringLength", prev)


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """Connect-safe explain: classic sessions render through the JVM
    QueryExecution; Connect sessions capture ``df.explain`` (which
    prints a server-rendered string)."""
    try:
        jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
        return df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
        )
    except AttributeError:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode=mode)
        return buf.getvalue()


def _split_balanced(s: str) -> list[str]:
    """Split a comma-separated list, ignoring commas inside parens
    (predicate args like GreaterThanOrEqual(p_size,10))."""
    out, buf, depth = [], [], 0
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return [x for x in out if x]


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the datasource scan(s), flattened."""
    out: list[str] = []
    for m in re.finditer(
        r"PushedFilters: \[(.*?)(?:\]|\.\.\.|\n)", executed_plan(df)
    ):
        out.extend(_split_balanced(m.group(1)))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (column pruning check)."""
    cols: list[str] = []
    for m in re.finditer(
        r"ReadSchema: struct<(.*?)(?:>|\.\.\.|\n)", executed_plan(df)
    ):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges planned (broadcast exchanges are
    not counted — they move small data by design)."""
    plan = executed_plan(df)
    return len(re.findall(r"\bExchange (?:hash|range|Single)", plan))


_WINDOW_CLASSES = (
    # logical nodes (optimizedPlan — the stable census signal)
    "Window",
    "WindowGroupLimit",
    # physical nodes (executedPlan — for ad-hoc inspection)
    "WindowExec",
    "WindowGroupLimitExec",
    "WindowInPandasExec",
)


def unpartitioned_windows(df: DataFrame, physical: bool = False) -> list[str]:
    """Window nodes with an EMPTY partition spec — Spark's own
    ``WindowExec: No Partition Defined`` warning class.  Such a node
    funnels its entire input through ONE task: correct at any sf, a
    straggler/OOM at 100 TB unless the windowed grain is provably
    bounded (a day spine, a ≤K-row design table, a post-limit
    survivor set), or rank-filtered (WindowGroupLimit partial-limits
    every input partition to K rows).

    Walks the OPTIMIZED LOGICAL plan by default: physical plans
    reuse exchanges data-dependently, so their node counts drift
    across scale factors — the logical census is deterministic
    (optimizer rules are data-independent with AQE out of the
    picture).  ``physical=True`` walks the executed plan instead.
    Walks children + subqueries so nested-bracket expression strings
    can't fool a regex.  Returns one class-name entry per offending
    node; Connect sessions (no _jdf) return [] — the audit runs on
    classic sessions only."""
    try:
        qe = df._jdf.queryExecution()
        root = qe.executedPlan() if physical else qe.optimizedPlan()
    except AttributeError:  # pragma: no cover - Spark Connect
        return []
    # JVM identity (not py4j wrapper id — wrappers are fresh per
    # call): logical trees SHARE subtree objects when one DataFrame
    # feeds several branches, and double-counting a shared window
    # subtree made counts nondeterministic
    ident = df.sparkSession._jvm.java.lang.System.identityHashCode  # type: ignore[union-attr]
    out: list[str] = []
    stack = [root]
    seen: set[int] = set()
    while stack:
        node = stack.pop()
        key = ident(node)
        if key in seen:
            continue
        seen.add(key)
        cls = node.getClass().getSimpleName()
        if cls in _WINDOW_CLASSES and node.partitionSpec().isEmpty():
            out.append(cls)
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
        try:
            subqueries = node.subqueries()
            for i in range(subqueries.size()):
                stack.append(subqueries.apply(i))
        except Exception:  # pragma: no cover - node without subqueries
            pass
    return out
