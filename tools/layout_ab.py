"""Layout A/B: measure a query's physical-layout candidates and record
the winner as planner feedback.

The static layout model (optimizer/layouts.py) costs registered bucketed
copies from footer bytes; bytes cannot see decode cost, aggregate-state
behavior, or cache effects. This tool closes the loop the way the
reference's history feedback does for cardinalities: run the candidates,
time them (cold + steady; steady decides), and write the winner into
``_layout_feedback.json`` — from then on the planner serves the MEASURED
choice for that (query, corpus) and skips the static model.

Candidates per query: the static model's choice, all-flat, and — greedily
per layout-eligible table — each registered layout substituted into the
static choice. Bounded: 1 + 1 + Σ per-table alternatives runs, each
executed twice.

Usage: python tools/layout_ab.py <sf_dir> tpch_q11 [tpch_q20 ...]
       (records feedback only when a candidate beats the static choice;
        ties within 3% keep the static choice — no noise-chasing)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def candidates(static: dict, sf_dir: str) -> list[dict]:
    from verax_spark.sources.layout import (
        _registry_entries,
        derived_digest,
        source_fingerprint,
    )

    out = [dict(static), {t: () for t in static}]
    # "<table>@proj" keys select a materialized-projection copy (r10);
    # enumerate them alongside the bucket alternatives of the base table
    for table in {t.split("@", 1)[0] for t in static}:
        path = os.path.join(sf_dir, f"{table}.parquet")
        entries = _registry_entries(source_fingerprint(path), table)
        bucket_alts = [
            tuple(e["bucket_cols"])
            for e in entries
            if e.get("kind") != "projection"
        ]
        proj_alts = [
            (derived_digest(e["derived"]),)
            for e in entries
            if e.get("kind") == "projection"
        ]
        # full bucket x projection cross — many combos are physically
        # identical (a bucket choice is moot while @proj serves the scan);
        # the caller's plan-fingerprint dedupe collapses those for free
        for alt in bucket_alts + [()]:
            for palt in (proj_alts + [()]) if proj_alts else [None]:
                cand = dict(static)
                cand[table] = alt
                if palt is not None:
                    cand[f"{table}@proj"] = palt
                if cand not in out:
                    out.append(cand)
    return out


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from verax_spark.catalog import Catalog
    from verax_spark.optimizer.layouts import (
        choose_layouts,
        policy,
        record_layout_feedback,
    )
    from verax_spark.queries import tpch
    from verax_spark.session import get_spark

    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    # A/B sweeps build a fresh DataFrame per candidate; without periodic
    # context GC the dead candidates' shuffle files accumulate in blockmgr
    # for the whole process lifetime (measured: an sf100 q3 sweep filled
    # 23 GB of temp and died on ENOSPC). 30s periodic GC bounds it to the
    # live candidate's working set.
    spark = get_spark(
        "verax-layout-ab",
        extra_conf={"spark.cleaner.periodicGC.interval": "30s"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        wrapped = tpch.QUERIES[name]
        fn = getattr(wrapped, "__wrapped_query__", wrapped)
        with policy("flat"):
            flat_df = fn(spark, sf_dir)
            static = choose_layouts(flat_df, Catalog(spark, sf_dir), sf_dir)
        if not static:
            print(f"{name}: no registered layouts at {sf_dir}; skipping")
            continue
        timings: dict[str, float] = {}
        results: list[tuple[float, dict]] = []
        seen_plans: dict[str, str] = {}  # plan fingerprint -> first tag
        for cand in candidates(static, sf_dir):
            tag = json.dumps(cand, sort_keys=True)
            with policy(dict(cand) if any(cand.values()) else "flat"):
                # candidates differing only in a policy key the query never
                # consults (e.g. a bucket choice while @proj serves the
                # scan) produce the IDENTICAL physical plan — timing them
                # separately just measures noise and lets noise get
                # recorded as feedback. Dedupe by analyzed-plan text.
                import hashlib as _h
                import re as _re

                df = fn(spark, sf_dir)
                # exprIds differ per build — normalize them out, else no
                # two plans ever match
                plan_text = _re.sub(
                    r"#\d+",
                    "#",
                    df._jdf.queryExecution().analyzed().toString(),
                )
                fp = _h.md5(plan_text.encode()).hexdigest()
                if fp in seen_plans:
                    print(f"{name} {tag}: = {seen_plans[fp]}", flush=True)
                    continue
                seen_plans[fp] = tag
                df.collect()  # cold
                sec = float("inf")  # steady: min of two (C2 JIT tail)
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).collect()
                    sec = min(sec, round(time.perf_counter() - t0, 3))
            timings[tag] = sec
            results.append((sec, cand))
            print(f"{name} {tag}: {sec}s", flush=True)
        results.sort(key=lambda r: r[0])
        best_sec, best = results[0]
        static_sec = timings[json.dumps(static, sort_keys=True)]
        if best != static and best_sec < static_sec * 0.97:
            record_layout_feedback(
                fn.__module__, fn.__qualname__, sf_dir, best, timings
            )
            print(
                f"{name}: FEEDBACK recorded {best} ({best_sec}s vs static "
                f"{static_sec}s)",
                flush=True,
            )
        else:
            print(
                f"{name}: static choice stands ({static_sec}s; best "
                f"{best_sec}s within noise margin)",
                flush=True,
            )


if __name__ == "__main__":
    main()
