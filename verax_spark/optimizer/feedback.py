"""Execution feedback: executed-plan metrics → ExecutionHistory actuals.

Reference: after a query runs, the reference records per-node actual
cardinalities keyed by plan-node history keys, and the next planning of the
same shapes consults them instead of re-estimating
(``VeloxHistory::recordVeloxExecution``, axiom/optimizer/VeloxHistory.h:44-50;
History API Cost.h:35-89).

Spark-first translation: Spark already measures per-operator actuals — every
physical node carries SQL metrics (``numOutputRows``) populated during the
normal action, so feedback costs ZERO extra jobs. After an action on a
DataFrame the SQL front door planned, we walk the *executed* plan via py4j,
find each parquet scan, take the nearest enclosing Filter's ``numOutputRows``
(the filtered-scan cardinality the planner estimated), match the scan back to
the planned leaf by its file paths, and record the actual under the exact
history signature the planner used (``query_graph._signature``). The next
planning pass prefers these actuals over footer/sampling estimates
(``ExecutionHistory.lookup``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# nodes that preserve row counts between a Filter and the scan below it —
# a Filter's numOutputRows is the filtered-scan actual only when every
# intervening node is one of these
_ROW_PRESERVING = (
    "ColumnarToRow",
    "RowToColumnar",
    "InputAdapter",
    "WholeStageCodegen",
    "Project",
)

# early-stopping operators: scans below them may be partially consumed, so
# their metrics UNDER-report true cardinalities — never record from such runs
_EARLY_STOP = ("CollectLimit", "GlobalLimit", "LocalLimit")


def _node_name(jnode) -> str:
    try:
        return str(jnode.nodeName())
    except Exception:
        return ""


def _children(jnode):
    """Children of a JVM SparkPlan node, descending through AQE wrappers
    (AdaptiveSparkPlanExec.executedPlan, QueryStageExec.plan)."""
    cls = jnode.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return [jnode.executedPlan()]
    if cls.endswith("QueryStageExec"):
        return [jnode.plan()]
    out = []
    seq = jnode.children()
    for i in range(seq.size()):
        out.append(seq.apply(i))
    return out


def _metric(jnode, name: str) -> float | None:
    try:
        opt = jnode.metrics().get(name)
        if opt.isDefined():
            return float(opt.get().value())
    except Exception:
        pass
    return None


def _scan_roots(jnode) -> list[str]:
    """Root paths of a FileSourceScanExec (normalized, no scheme)."""
    out = []
    try:
        seq = jnode.relation().location().rootPaths()
        for i in range(seq.size()):
            p = str(seq.apply(i))
            out.append(p.removeprefix("file://").removeprefix("file:"))
    except Exception:
        pass
    return out


def collect_scan_actuals(df: DataFrame) -> list[tuple[list[str], float]]:
    """[(root paths, filtered-scan numOutputRows)] from df's executed plan.
    Empty when the plan early-stops (limits) or metrics are unavailable.
    Call only AFTER a full action (collect/toPandas) — metrics are populated
    by execution."""
    try:
        root = df._jdf.queryExecution().executedPlan()
    except Exception:
        return []
    out: list[tuple[list[str], float]] = []
    seen_early_stop = False

    def walk(jnode, pending: float | None) -> None:
        nonlocal seen_early_stop
        name = _node_name(jnode)
        cls = jnode.getClass().getSimpleName()
        if any(name.startswith(e) for e in _EARLY_STOP):
            seen_early_stop = True
            return
        if cls == "FileSourceScanExec":
            rows = pending
            if rows is None:
                rows = _metric(jnode, "numOutputRows")
            roots = _scan_roots(jnode)
            if rows is not None and roots:
                out.append((roots, rows))
            return
        if name.startswith("Filter"):
            pending = _metric(jnode, "numOutputRows")
        elif not any(name.startswith(p) for p in _ROW_PRESERVING):
            pending = None  # row counts change (or unknown) past this node
        for child in _children(jnode):
            walk(child, pending)

    try:
        walk(root, None)
    except Exception:
        return []
    return [] if seen_early_stop else out


def record_actuals(
    df: DataFrame,
    history,
    signatures: dict[str, tuple[str, tuple[str, ...]]],
) -> dict[str, float]:
    """Match executed-plan scans back to planned leaves and record actual
    filtered-scan row counts into ``history`` under the planner's own
    signatures. ``signatures``: alias → (signature, input file paths) from
    ``ReorderInfo.signatures``. Returns {signature: actual} for what was
    recorded; ambiguous matches (same table scanned twice with different
    predicates) are skipped rather than guessed."""
    actuals = collect_scan_actuals(df)
    if not actuals:
        return {}

    def leaf_matches(files: tuple[str, ...], roots: list[str]) -> bool:
        return any(f == r or f.startswith(r.rstrip("/") + "/") for f in files for r in roots)

    recorded: dict[str, float] = {}
    for alias, (sig, files) in signatures.items():
        if not files:
            continue
        # another planned leaf over the same files (self-join) → scans are
        # indistinguishable by path; skip rather than guess
        sharers = [
            a
            for a, (_, f) in signatures.items()
            if a != alias and set(f) & set(files)
        ]
        hits = [rows for roots, rows in actuals if leaf_matches(files, roots)]
        if len(hits) == 1 and not sharers:
            history.record(sig, hits[0])
            recorded[sig] = hits[0]
    if recorded:
        try:
            history.save()
        except OSError:
            pass
    return recorded
