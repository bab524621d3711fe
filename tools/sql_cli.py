"""Interactive Presto-SQL shell (AxiomSql analog).

The reference ships a CLI that parses Presto SQL, runs it through the
optimizer, prints plans, and can re-run each query under combinations of
optimizer flags checking result equality
(axiom/optimizer/tests/AxiomSql.cpp:48-108, check_test_flag_combinations
:105-108,631). This is that tool for the Spark engine:

    python tools/sql_cli.py [--sf-dir DIR]

Commands inside the shell (everything else is executed as SQL):
    \\q                    quit
    \\explain <sql>        formatted Catalyst plan (post-reorder)
    \\plan <sql>           the reorderer's decision (order/broadcast/est)
    \\sweep <sql>          run under optimizer flag combinations
                          (reorder on/off × AQE on/off) and verify all
                          produce identical results
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _rows_key(df) -> list[tuple]:
    return sorted(map(tuple, ((str(v) for v in row) for row in df.collect())))


def sweep(spark, sf_dir: str, sql: str) -> list[str]:
    """Run ``sql`` under optimizer-flag combinations; return descriptions of
    the combos; raise AssertionError if any result diverges (the
    metamorphic check AxiomSql performs with test flag combinations)."""
    from verax_spark.sql import PrestoSession

    combos = []
    baseline = None
    for reorder in (True, False):
        for aqe in ("true", "false"):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            try:
                df = PrestoSession(spark, sf_dir, reorder=reorder).sql(sql)
                key = _rows_key(df)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "true")
            desc = f"reorder={reorder} aqe={aqe}: {len(key)} rows"
            combos.append(desc)
            if baseline is None:
                baseline = key
            else:
                assert key == baseline, f"sweep divergence at {desc}"
    return combos


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description="Presto-SQL shell on Spark")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("-e", "--execute", help="run one statement and exit")
    args = ap.parse_args()

    from verax_spark.session import get_spark
    from verax_spark.sql import PrestoSession

    spark = get_spark("verax-sql-cli")
    spark.sparkContext.setLogLevel("ERROR")
    ps = PrestoSession(spark, args.sf_dir)

    def run_one(line: str) -> None:
        line = line.strip().rstrip(";")
        if not line:
            return
        if line.startswith("\\plan "):
            ps.sql(line[6:])
            info = ps.last_reorder
            if info is None:
                print("(not eligible for reordering — textual order kept)")
            else:
                print(f"order:     {' -> '.join(info.order)}")
                print(f"broadcast: {', '.join(info.broadcast) or '(none)'}")
                print(f"est rows:  { {k: round(v) for k, v in info.est.items()} }")
            return
        if line.startswith("\\explain "):
            df = ps.sql("explain " + line[9:])
            print(df.collect()[0][0])
            return
        if line.startswith("\\sweep "):
            for desc in sweep(spark, args.sf_dir, line[7:]):
                print(f"  ok {desc}")
            print("all flag combinations agree")
            return
        ps.sql(line).show(50, truncate=False)

    if args.execute:
        run_one(args.execute)
        return 0
    print(f"verax-spark sql shell — tables from {args.sf_dir} (\\q quits)")
    while True:
        try:
            line = input("sql> ")
        except EOFError:
            break
        if line.strip() in ("\\q", "quit", "exit"):
            break
        try:
            run_one(line)
        except Exception as ex:  # noqa: BLE001 — shell survives bad input
            print(f"error: {type(ex).__name__}: {str(ex)[:400]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
