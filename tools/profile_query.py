"""Phase breakdown of a declared query at bench conditions.

For each named query: run once untimed (warm-up), then time run 2 and 3
split into DAG-construction time (fn() — includes eager localCheckpoints
and planning py4j traffic) vs action time (.collect()), and report the
Spark job count and per-job wall time of the final run via the status
tracker.

Usage: python tools/profile_query.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from verax_spark.session import get_spark

    import __spark_entry__ as E

    sf_dir = sys.argv[1] if sys.argv[1:] and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.1"
    names = [a for a in sys.argv[1:] if not os.path.isdir(a)]
    qs = E.queries()

    small = "sf0." in sf_dir
    spark = get_spark("profile", shuffle_partitions=8 if small else None)
    if small:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm the JVM once
    next(iter(qs.values()))(spark, sf_dir).collect()

    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # cold run, untimed
        for run in (2, 3):
            st = sc.statusTracker()
            before_jobs = set(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.collect()
            t_collect = time.perf_counter() - t0
            st = sc.statusTracker()
            after_jobs = set(st.getJobIdsForGroup(None) or [])
            new_jobs = sorted(after_jobs - before_jobs)
            job_times = []
            for j in new_jobs:
                info = st.getJobInfo(j)
                if info is None:
                    continue
                stages = [st.getStageInfo(s) for s in info.stageIds]
                n_tasks = sum(s.numTasks for s in stages if s is not None)
                job_times.append((j, len(info.stageIds), n_tasks))
            print(
                f"{name} run{run}: build={t_build:.3f}s collect={t_collect:.3f}s "
                f"total={t_build + t_collect:.3f}s jobs={len(new_jobs)}"
            )
            if run == 3:
                for j, n_stages, n_tasks in job_times:
                    print(f"    job {j}: stages={n_stages} tasks={n_tasks}")


if __name__ == "__main__":
    main()
