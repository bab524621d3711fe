"""Distributed-plan fragment spec: the MultiFragmentPlan analog.

Reference: the optimizer's output is a MultiFragmentPlan — a vector of
ExecutableFragment{taskPrefix, width, PlanFragment, inputStages} where every
Repartition becomes a fragment boundary: the producer ends in a
PartitionedOutputNode (partitioned / broadcast / gather) and the consumer
starts with an Exchange (axiom/runner/MultiFragmentPlan.h:40-111,
axiom/optimizer/ToVelox.cpp:1270-1308).

Spark's scheduler owns the same decomposition implicitly (stage = fragment,
Exchange = boundary). This module makes it explicit and inspectable: it
walks the physical plan, cuts it at exchanges, and returns the same
fragment spec the reference hands to its runner — task prefix, width
(output partition count), boundary kind, operator list, input fragments.
Useful for plan audits ("how many shuffles, how wide, what's broadcast")
and asserted in tests the way the reference asserts fragment counts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_BOUNDARIES = {
    "ShuffleExchangeExec",
    "BroadcastExchangeExec",
    "ReusedExchangeExec",
}


@dataclass
class Fragment:
    """ExecutableFragment analog (MultiFragmentPlan.h:40-76)."""

    task_prefix: str
    width: int
    kind: str  # root | partitioned | broadcast | gather | ordered-gather | reused
    ops: list[str] = field(default_factory=list)
    inputs: list["Fragment"] = field(default_factory=list)

    def pretty(self, indent: int = 0) -> str:
        pad = "  " * indent
        # width 0 = decided at runtime by split enumeration (file scans),
        # like the reference's per-fragment width defaults
        width = self.width if self.width else "auto"
        head = f"{pad}{self.task_prefix} [{self.kind}, width={width}]: " + " <- ".join(
            self.ops
        )
        return "\n".join([head] + [f.pretty(indent + 1) for f in self.inputs])

    def count(self) -> int:
        return 1 + sum(f.count() for f in self.inputs)


def _boundary_kind(node) -> str:
    cls = node.getClass().getSimpleName()
    if cls == "BroadcastExchangeExec":
        return "broadcast"
    if cls == "ReusedExchangeExec":
        return "reused"
    part = node.outputPartitioning().toString()
    if "SinglePartition" in part:
        return "gather"
    if "RangePartitioning" in part:
        return "ordered-gather"
    return "partitioned"


def _width(node) -> int:
    try:
        return int(node.outputPartitioning().numPartitions())
    except Exception:
        return 1


def _physical_root(df: DataFrame):
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.initialPlan()
    return plan


def fragment_plan(df: DataFrame) -> Fragment:
    """Decompose the physical plan into the fragment spec (fragment 0 is
    the root/gather-to-driver fragment; inputs are producer fragments)."""
    counter = [0]

    def cut(node, kind: str) -> Fragment:
        frag = Fragment(
            task_prefix=f"fragment{counter[0]}", width=_width(node), kind=kind
        )
        counter[0] += 1
        fill(node, frag)
        return frag

    def fill(node, frag: Fragment) -> None:
        cls = node.getClass().getSimpleName()
        if cls in _BOUNDARIES:
            kind = _boundary_kind(node)
            if kind == "reused":
                frag.inputs.append(
                    Fragment(
                        task_prefix=f"fragment{counter[0]}",
                        width=_width(node),
                        kind="reused",
                        ops=["ReusedExchange"],
                    )
                )
                counter[0] += 1
                return
            # boundary: the child subtree is a producer fragment
            child = node.children().apply(0)
            frag.inputs.append(cut(child, kind))
            return
        frag.ops.append(node.nodeName().strip())
        for i in range(node.children().size()):
            fill(node.children().apply(i), frag)

    return cut(_physical_root(df), "root")


def explain_fragments(df: DataFrame) -> str:
    """Pretty multi-fragment spec, the reference's MultiFragmentPlan
    toString analog."""
    return fragment_plan(df).pretty()


def graphviz_fragments(df: DataFrame) -> str:
    """DOT rendering of the fragment tree — EXPLAIN (FORMAT GRAPHVIZ),
    the reference's ExplainFormat kGraphviz (AstStatements.h:597-635).
    One node per fragment (label = task prefix + operator chain), one
    edge per exchange, labelled with the exchange kind."""
    root = fragment_plan(df)
    lines = ["digraph plan {", "  node [shape=box];"]
    counter = [0]

    def emit(f: "Fragment") -> str:
        nid = f"f{counter[0]}"
        counter[0] += 1
        label = f"{f.task_prefix}\\n" + " <- ".join(f.ops)
        label = label.replace('"', "'")
        lines.append(f'  {nid} [label="{label}"];')
        for child in f.inputs:
            cid = emit(child)
            lines.append(f'  {cid} -> {nid} [label="{child.kind}"];')
        return nid

    emit(root)
    lines.append("}")
    return "\n".join(lines)
