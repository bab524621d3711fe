"""Mergeable sketch state (functions/sketches.py + the HLL binary path).

Presto's sketch contract (ref AxiomSql.cpp:149 registers the real types):
build per key → store → merge later. Unit tests pin the t-digest math
(accuracy, merge order-independence, serialization); Spark tests pin the
store-to-parquet → read-back → merge lifecycle for both HLL and t-digest.
"""

import numpy as np
import pyspark.sql.functions as F
import pytest

from verax_spark.functions.sketches import (
    build_digest,
    deserialize,
    merge_digests,
    quantile_from_digest,
    serialize,
    tdigest_merge,
    tdigest_partials,
    tdigest_quantile,
)


def test_digest_quantile_accuracy():
    rng = np.random.RandomState(7)
    vals = rng.normal(100.0, 15.0, 50_000)
    d = build_digest(vals)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        exact = np.quantile(vals, q)
        est = quantile_from_digest(d, q)
        # t-digest mid-quantile error at compression 200 is well under
        # 0.5% of the distribution's scale
        assert abs(est - exact) < 0.01 * 15.0 * 10, (q, est, exact)


def test_merge_equals_whole_build_within_tolerance():
    rng = np.random.RandomState(11)
    vals = rng.exponential(50.0, 30_000)
    parts = np.array_split(vals, 7)
    merged = merge_digests([build_digest(p) for p in parts])
    whole = build_digest(vals)
    for q in (0.1, 0.5, 0.9):
        a = quantile_from_digest(merged, q)
        b = quantile_from_digest(whole, q)
        exact = np.quantile(vals, q)
        assert abs(a - exact) / exact < 0.02
        assert abs(b - exact) / exact < 0.02


def test_merge_is_order_independent():
    rng = np.random.RandomState(3)
    blobs = [build_digest(rng.uniform(0, 1000, 5000)) for _ in range(5)]
    fwd = merge_digests(blobs)
    rev = merge_digests(list(reversed(blobs)))
    assert fwd == rev  # byte-identical: centroids re-sorted before compress


def test_serialize_roundtrip_and_empty():
    m = np.array([1.5, 2.5])
    w = np.array([3.0, 4.0])
    m2, w2 = deserialize(serialize(m, w))
    assert np.array_equal(m, m2) and np.array_equal(w, w2)
    assert quantile_from_digest(build_digest(np.array([])), 0.5) is None


def test_spark_store_and_merge_lifecycle(spark, sf_dir, tmp_path):
    """Build per-nation sketches, write parquet, read back, merge to
    global — estimates track exact values."""
    from verax_spark.catalog import Catalog
    from verax_spark.functions.presto import presto_call as pc

    cat = Catalog(spark, sf_dir)
    cust = cat.customer
    hll = cust.groupBy("c_nationkey").agg(
        pc("approx_set", F.col("c_custkey")).alias("hll")
    )
    td = tdigest_merge(
        tdigest_partials(cust, ["c_nationkey"], "c_acctbal"),
        ["c_nationkey"],
    )
    store = str(tmp_path / "sketches")
    hll.join(td, "c_nationkey").write.parquet(store)

    stored = spark.read.parquet(store)
    assert dict(stored.dtypes)["hll"] == "binary"
    assert dict(stored.dtypes)["tdigest"] == "binary"

    row = (
        stored.groupBy()
        .agg(pc("merge", F.col("hll")).alias("h"))
        .select(F.hll_sketch_estimate("h").alias("est"))
        .collect()[0]
    )
    exact = cust.select("c_custkey").distinct().count()
    assert abs(row.est - exact) / exact < 0.05

    global_td = (
        tdigest_merge(stored.withColumn("g", F.lit(1)), ["g"], "tdigest")
        .select(tdigest_quantile(F.col("tdigest"), 0.5).alias("med"))
        .collect()[0]
    )
    exact_med = cust.selectExpr("percentile(c_acctbal, 0.5) as m").collect()[0].m
    assert abs(global_td.med - exact_med) / abs(exact_med) < 0.02
