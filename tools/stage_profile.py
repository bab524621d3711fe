"""Per-stage breakdown of a declared query (guide §1.1 empirical loop).

Runs a query at a given sf_dir (one untimed warm-up, then a timed steady
run), then reads the driver's own REST status API and prints every stage
of the steady run sorted by executor run time, with the metrics that
decide what to optimize: input bytes/records, shuffle read/write bytes,
spill, task count. This is the "open the Spark UI, find the slowest
stage" loop in scriptable form (the bench sessions run with the UI off).

Usage: python tools/stage_profile.py <sf_dir> query [query ...]
Env:   SPARK_GRAFT_PROFILE_RUNS=n   extra steady runs (default 1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _mb(b: float) -> str:
    return f"{b / (1 << 20):8.1f}M"


def main() -> None:
    from verax_spark.session import get_spark

    import __spark_entry__ as E

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    qs = E.queries()

    small = "sf0." in sf_dir
    spark = get_spark(
        "stage-profile",
        shuffle_partitions=8 if small else None,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    if small:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    app_id = sc.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"

    def stages() -> dict[int, dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return {s["stageId"]: s for s in json.load(r)}

    # warm the JVM once (with a requested query, so corpora that only carry
    # that query's tables — e.g. the TPC-H-only sf100 derivation — work)
    qs[names[0]](spark, sf_dir).collect()

    for name in names:
        fn = qs[name]
        sc.setJobDescription(f"{name}: warm-up")
        fn(spark, sf_dir).collect()  # cold run, untimed
        runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "1"))
        for run in range(runs):
            before = set(stages())
            sc.setJobDescription(f"{name}: steady")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            wall = time.perf_counter() - t0
            after = stages()
            new = [s for sid, s in after.items() if sid not in before]
            new.sort(key=lambda s: -s.get("executorRunTime", 0))
            total_exec = sum(s.get("executorRunTime", 0) for s in new)
            print(f"\n=== {name} steady run {run + 1}: wall {wall:.2f}s, "
                  f"{len(new)} stages, executor-time {total_exec / 1e3:.1f}s")
            print(f"{'stage':>5} {'exec-s':>7} {'tasks':>5} {'input':>9} "
                  f"{'shRead':>9} {'shWrite':>9} {'spill':>9}  name")
            for s in new[:14]:
                print(
                    f"{s['stageId']:5d} {s.get('executorRunTime', 0) / 1e3:7.1f}"
                    f" {s.get('numCompleteTasks', 0):5d}"
                    f" {_mb(s.get('inputBytes', 0))}"
                    f" {_mb(s.get('shuffleReadBytes', 0))}"
                    f" {_mb(s.get('shuffleWriteBytes', 0))}"
                    f" {_mb(s.get('diskBytesSpilled', 0))}"
                    f"  {s.get('name', '')[:60]}"
                )
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
