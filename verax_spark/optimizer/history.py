"""Execution-history feedback store (VeloxHistory analog).

Reference: the optimizer records per-node actual cardinalities keyed by
canonical plan-node history keys and consults them on the next planning run
(axiom/optimizer/Cost.h:35-89 History API; VeloxHistory.h:44-50
recordVeloxExecution; ToVelox.h:30-45 history keys; save/load Cost.h:78-80).

Here: a JSON-backed map  signature → observed row count.  Signatures are
canonical strings for scan+filter units (query_graph._signature) or whole
plans (plan_signature). `observe()` wraps a DataFrame with a Spark
observation so the *actual* row count flowing past is captured during the
normal action — no extra job — then recorded on collection.
"""

from __future__ import annotations

import json
import os
import re
import tempfile

from pyspark.sql import DataFrame, Observation
import pyspark.sql.functions as F

_DEFAULT_PATH = os.path.join(tempfile.gettempdir(), "verax_history.json")


def plan_signature(df: DataFrame) -> str:
    """Canonical signature of a DataFrame's analyzed logical plan: plan text
    with expression ids (#123) and run-specific paths stripped — stable
    across sessions for the same logical query."""
    text = df._jdf.queryExecution().analyzed().toString()
    text = re.sub(r"#\d+L?", "#", text)
    text = re.sub(r"file:[^\],\s]+", "file:", text)
    return text


class ExecutionHistory:
    def __init__(self, path: str | None = None):
        self.path = path or _DEFAULT_PATH
        self._data: dict[str, float] = {}
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    self._data = json.load(f)
            except (json.JSONDecodeError, OSError):
                self._data = {}
        self._estimates: dict[str, float] = {}

    # -- store/lookup --------------------------------------------------------
    def lookup(self, signature: str) -> float | None:
        """Observed actuals take precedence; otherwise fall back to the last
        recorded estimate so repeated plannings of the same scan/edge reuse
        the sampling work instead of re-probing (the reference's history
        serves both roles, Cost.h:35-89)."""
        v = self._data.get(signature)
        return v if v is not None else self._estimates.get(signature)

    def record(self, signature: str, actual_rows: float) -> None:
        self._data[signature] = float(actual_rows)

    def record_estimate(self, signature: str, est_rows: float) -> None:
        """Planner's guess, kept for miss-analysis (estimate vs actual)."""
        self._estimates[signature] = float(est_rows)

    def misestimates(self, factor: float = 4.0) -> dict[str, tuple[float, float]]:
        """Signatures whose actuals diverge ≥ factor× from the estimate —
        the feedback signal the reference uses to re-cost plans."""
        out = {}
        for sig, est in self._estimates.items():
            actual = self._data.get(sig)
            if actual is None:
                continue
            lo, hi = sorted([max(est, 1.0), max(actual, 1.0)])
            if hi / lo >= factor:
                out[sig] = (est, actual)
        return out

    def save(self) -> None:
        with open(self.path, "w") as f:
            json.dump(self._data, f)

    # -- observation plumbing ------------------------------------------------
    def observe(self, df: DataFrame, signature: str) -> tuple[DataFrame, "_Pending"]:
        """Attach a row-count observation; call pending.flush() after the
        action to record the actual count (zero extra Spark jobs)."""
        obs = Observation(f"verax_history_{abs(hash(signature)) % 10**9}")
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        return observed, _Pending(self, signature, obs)


class _Pending:
    def __init__(self, history: ExecutionHistory, signature: str, obs: Observation):
        self.history = history
        self.signature = signature
        self.obs = obs

    def flush(self) -> float:
        rows = float(self.obs.get["rows"])
        self.history.record(self.signature, rows)
        return rows
