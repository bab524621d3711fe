"""As-of and banded range join semantics + plan-shape guarantees.

Brute-force oracles are computed in-test over tiny synthetic frames; the
plan assertions pin the scale contract (equi-join shapes, no nested-loop
cartesian products).
"""

import datetime

import pyspark.sql.functions as F

from verax_spark.operators import temporal
from verax_spark.plans.builder import local_values


def _ts(day, hour=0, minute=0, second=0, micro=0):
    return datetime.datetime(2024, 1, day, hour, minute, second, micro)


def _events(spark):
    rows = [
        # (id, user, ts, value)
        (1, 10, _ts(1, 9), 1.0),
        (2, 10, _ts(1, 12), 2.0),
        (3, 10, _ts(2, 12), 3.0),
        (4, 20, _ts(1, 9), 4.0),
        (5, 20, _ts(1, 9), 5.0),  # exact-ts tie with id=4
        (6, 30, _ts(5, 0), 6.0),
    ]
    return local_values(spark, rows, "id bigint, u bigint, t timestamp, v double")


def test_asof_backward_inclusive_and_ties(spark):
    right = _events(spark).select(
        F.col("id").alias("r_id"), F.col("u").alias("r_u"),
        F.col("t").alias("r_t"), F.col("v").alias("r_v"),
    )
    left = local_values(
        spark,
        [
            (100, 10, _ts(1, 12)),   # equal ts → inclusive match on id=2
            (101, 10, _ts(1, 10)),   # between 1 and 2 → id=1
            (102, 10, _ts(1, 8)),    # before all → null
            (103, 20, _ts(1, 9)),    # tie at same right ts → max tie id=5
            (104, 40, _ts(9, 9)),    # user with no right rows → null
            (105, 30, _ts(6, 0)),    # one candidate → id=6
        ],
        "lid bigint, u bigint, t timestamp",
    )
    out = temporal.asof_join(
        left,
        right,
        left_ts="t",
        right_ts="r_t",
        left_by="u",
        right_by="r_u",
        value_cols=["r_id", "r_v"],
        tie_break="r_id",
    )
    got = {r["lid"]: (r["asof_r_id"], r["asof_r_v"]) for r in out.collect()}
    assert got == {
        100: (2, 2.0),
        101: (1, 1.0),
        102: (None, None),
        103: (5, 5.0),
        104: (None, None),
        105: (6, 6.0),
    }


def test_asof_tolerance(spark):
    right = _events(spark).select(
        F.col("id").alias("r_id"), F.col("u").alias("r_u"), F.col("t").alias("r_t")
    )
    left = local_values(
        spark,
        [(200, 10, _ts(2, 13)), (201, 10, _ts(3, 13))],
        "lid bigint, u bigint, t timestamp",
    )
    out = temporal.asof_join(
        left,
        right,
        left_ts="t",
        right_ts="r_t",
        left_by="u",
        right_by="r_u",
        value_cols=["r_id"],
        tie_break="r_id",
        tolerance_us=2 * 3600 * 1_000_000,  # 2h lookback
    )
    got = {r["lid"]: r["asof_r_id"] for r in out.collect()}
    # id=3 is 1h before row 200 (in tolerance) but 25h before row 201
    assert got == {200: 3, 201: None}


def test_asof_single_shuffle_plan(spark):
    right = _events(spark).select(
        F.col("id").alias("r_id"), F.col("u").alias("r_u"), F.col("t").alias("r_t")
    )
    left = _events(spark).select("id", "u", "t")
    out = temporal.asof_join(
        left, right,
        left_ts="t", right_ts="r_t", left_by="u", right_by="r_u",
        value_cols=["r_id"], tie_break="r_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan  # no join operator at all — union + window


def test_range_join_matches_brute_force(spark, sf_dir):
    from verax_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).events.limit(500).cache()
    left = ev.select(
        F.col("event_id").alias("l_id"), F.col("user_id").alias("l_u"),
        (F.col("ts") - F.expr("INTERVAL 4 HOURS")).alias("l_start"),
        F.col("ts").alias("l_end"),
    )
    right = ev.select(
        F.col("event_id").alias("r_id"), F.col("user_id").alias("r_u"),
        F.col("ts").alias("r_t"),
    )
    banded = temporal.range_join(
        left, right,
        left_key="l_u", right_key="r_u",
        left_start="l_start", left_end="l_end", right_ts="r_t",
        bucket_seconds=4 * 3600,
    )
    got = sorted((r["l_id"], r["r_id"]) for r in banded.collect())
    brute = left.join(
        right,
        (F.col("l_u") == F.col("r_u"))
        & (F.col("r_t") >= F.col("l_start"))
        & (F.col("r_t") <= F.col("l_end")),
    )
    want = sorted((r["l_id"], r["r_id"]) for r in brute.collect())
    assert got == want and len(got) > 0
    ev.unpersist()


def test_range_join_is_equi_join_plan(spark, sf_dir):
    from verax_spark.catalog import Catalog

    ev = Catalog(spark, sf_dir).events
    left = ev.select(
        F.col("event_id").alias("l_id"), F.col("user_id").alias("l_u"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("l_start"),
        F.col("ts").alias("l_end"),
    )
    right = ev.select(
        F.col("event_id").alias("r_id"), F.col("user_id").alias("r_u"),
        F.col("ts").alias("r_t"),
    )
    out = temporal.range_join(
        left, right,
        left_key="l_u", right_key="r_u",
        left_start="l_start", left_end="l_end", right_ts="r_t",
        bucket_seconds=86400,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_salted_matches_unsalted(spark, sf_dir):
    """Salting must be invisible in results: bit-identical to the plain
    window path, for every salt factor."""
    from verax_spark.catalog import Catalog
    from verax_spark.operators import temporal

    ev = Catalog(spark, sf_dir).events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    kwargs = dict(
        left_ts="ts", right_ts="c_ts", left_by="user_id", right_by="c_user",
        value_cols=["c_ts", "c_id"], tie_break="c_id",
    )
    plain = temporal.asof_join(purchases, clicks, **kwargs)
    rows_plain = sorted(map(tuple, plain.collect()))
    for factor in (2, 8):
        salted = temporal.asof_join(
            purchases, clicks, salt_col="event_id", salt_factor=factor, **kwargs
        )
        assert sorted(map(tuple, salted.collect())) == rows_plain, factor


def test_asof_join_salted_splits_hot_key(spark):
    """A single pathologically hot by-key must spread over salt_factor
    window partitions — no one task carries the whole key."""
    from verax_spark.operators import temporal

    n = 4000
    left = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.lit(7).alias("user_id"),  # ONE hot key
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    right = spark.range(0, n, 10).select(
        F.lit(7).alias("c_user"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("c_ts"),
        F.col("id").alias("c_id"),
    )
    out = temporal.asof_join(
        left, right,
        left_ts="ts", right_ts="c_ts", left_by="user_id", right_by="c_user",
        value_cols=["c_id"], tie_break="c_id",
        salt_col="event_id", salt_factor=8,
    )
    # correct: every left row matches the floor-to-10 right row
    bad = out.filter(F.col("asof_c_id") != (F.col("event_id") / 10).cast("long") * 10)
    assert bad.count() == 0
    # the salt is real: left rows landed in >1 sub-partition of the hot key
    n_salts = (
        left.select(F.pmod(F.xxhash64("event_id"), F.lit(8)).alias("s"))
        .distinct().count()
    )
    assert n_salts == 8
