"""SQL replay harness (PrestoQueryReplayRunner analog).

The reference replays serialized production query fragments through the
optimizer to catch regressions (axiom/runner/tests/PrestoQueryReplayRunner.h:
31-47). Here the replay unit is Presto SQL text: a JSONL corpus of
statements — seeded with grammar-covering queries and grown automatically
whenever the SQL-text fuzzer (tests/test_parser_fuzz.py) finds a failing
input — is re-run every round through the full front door (parse →
cost-based reorder → Catalyst) and compared against DuckDB.

Corpus entry: {"name": ..., "sql": <presto text>, "oracle": <duckdb text
or null when the presto text is itself duckdb-runnable>, "note": ...}.

CLI: ``python tools/replay.py`` prints one line per entry and exits
nonzero on any mismatch.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS_PATH = os.path.join(_REPO, "replay", "corpus.jsonl")


def load_corpus(path: str = CORPUS_PATH) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def record(sql: str, *, name: str | None = None, oracle: str | None = None,
           note: str = "", path: str = CORPUS_PATH) -> bool:
    """Append a statement to the corpus (dedup by SQL text). Returns True
    when a new entry was written. Called by the fuzzer on failures so every
    bug found becomes a permanent regression test."""
    entries = load_corpus(path)
    if any(e["sql"].strip() == sql.strip() for e in entries):
        return False
    os.makedirs(os.path.dirname(path), exist_ok=True)
    entry = {
        "name": name or f"recorded_{len(entries):03d}",
        "sql": sql,
        "oracle": oracle,
        "note": note,
    }
    with open(path, "a") as f:
        f.write(json.dumps(entry) + "\n")
    return True


def replay_one(spark, sf_dir: str, entry: dict) -> int:
    """Run one corpus entry both ways; assert equality; return row count.

    Entries may carry ``setup`` (a list of Presto DDL/DML/txn statements
    run through the SAME session before the final ``sql``) and
    ``oracle_setup`` (DuckDB statements before the oracle query) — the
    statement-surface shapes (CTAS, INSERT/DELETE/UPDATE, transactions,
    schemas, materialized views) replay end-to-end, not just SELECTs."""
    from verax_spark.sql import PrestoSession
    from verax_spark.testing import assert_frames_match, duckdb_connection

    sess = PrestoSession(spark, sf_dir)
    for stmt in entry.get("setup") or []:
        sess.sql(stmt)
    got = sess.sql(entry["sql"]).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        for stmt in entry.get("oracle_setup") or []:
            con.execute(stmt)
        want = con.execute(entry.get("oracle") or entry["sql"]).df()
    finally:
        con.close()
    assert_frames_match(got, want, context=f"replay:{entry['name']}")
    return len(got)


def main() -> int:
    sys.path.insert(0, _REPO)
    from verax_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark("verax-replay")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for entry in load_corpus():
        try:
            rows = replay_one(spark, sf_dir, entry)
            print(f"{entry['name']}: OK rows={rows}")
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"{entry['name']}: FAIL {type(ex).__name__}: {str(ex)[:200]}")
    print(f"replayed {len(load_corpus())} statements, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
