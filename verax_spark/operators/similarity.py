"""Similarity search over embedding columns (array<float>).

Scale design:

- Embeddings are **quantized to integers** (floor(x · 2^20)) once at load.
  Dot products and norms become exact bigint arithmetic: order-independent
  (safe under any partitioning), cross-engine reproducible (differential
  checks), and faster than float lambdas. This mirrors production ANN
  practice (int8/int16 quantization) with a wider budget.
- **Brute-force top-k** broadcasts the (small) query set and streams the
  corpus: one pass, no shuffle on the corpus side, a tiny top-k-per-query
  aggregation at the end. At 100 TB of corpus this is the right baseline —
  it's embarrassingly parallel and I/O-bound.
- **LSH-bucketed** variant (random signed projections → sign bits → bucket
  equi-join) bounds the candidate set per query; recall trades off with
  band count. The projection vectors are generated deterministically from
  xxhash64 so the operator needs no stored model.
- Everything is Column expressions (transform/zip_with/aggregate) — JVM
  codegen, no Python UDFs in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from verax_spark.operators._exprcache import cached_exprs

QUANT_SCALE = 1 << 20


def quantize(vec: Column) -> Column:
    """array<float> → array<bigint>, exact: floor(x · 2^20)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * QUANT_SCALE).cast("long"))


def dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two array<bigint>."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine from exact integer dot/norms; the only floats are two sqrts
    and one division, identical on any engine given the same integers."""
    return cosine_with_norms(dot(a, b), dot(a, a), dot(b, b))


def cosine_with_norms(dot_ab: Column, n2_a: Column, n2_b: Column) -> Column:
    """The cosine() float expression over PRECOMPUTED exact-integer self
    dot products. Higher-order functions (zip_with/aggregate) run
    interpreted — Spark never codegens them — so evaluating dot(a,a) and
    dot(b,b) per PAIR was 3 interpreted O(dim) folds per comparison
    (measured: the 250-vector all-pairs verify spent 1.6s in 3 jobs at
    sf0.1). Call sites now fold each vector's norm ONCE per vector before
    the pair join and pass the integers here: same integers → the same
    two sqrts and one division → bit-identical doubles."""
    return dot_ab.cast("double") / (
        F.sqrt(n2_a.cast("double")) * F.sqrt(n2_b.cast("double"))
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors per query → (query_id, neighbor_id,
    cosine, rnk). Self-matches excluded. Broadcast the query side."""
    # per-vector norms folded ONCE before the pair join (see
    # cosine_with_norms: HOF folds are interpreted, so per-pair
    # re-evaluation of dot(v,v) tripled the verify cost)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
        ).withColumn("__qn2", dot(F.col("qv"), F.col("qv")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    ).withColumn("__cn2", dot(F.col("cv"), F.col("cv")))
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_with_norms(
                dot(F.col("qv"), F.col("cv")), F.col("__qn2"), F.col("__cn2")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
def _projection_component(dim_index: Column, proj: int) -> Column:
    """Deterministic pseudo-random ±1 component for projection `proj` at
    dimension `dim_index`: sign of xxhash64(proj, dim_index)."""
    return F.when(F.xxhash64(F.lit(proj), dim_index) % 2 == 0, 1).otherwise(-1)


def lsh_signature(vec_q: Column, *, n_projections: int = 16) -> Column:
    """Sign-projection signature as one bigint: bit p = [⟨v, r_p⟩ > 0] with
    r_p a deterministic ±1 vector."""
    def component(p: int):
        # two-arg lambda exactly — seed p must come via closure, not a
        # default arg (PySpark maps lambda arity onto HOF arguments)
        return lambda x, i: x * _projection_component(i, p)

    sig = F.lit(0).cast("long")
    for p in range(n_projections):
        proj_dot = F.aggregate(
            F.zip_with(
                vec_q,
                F.sequence(F.lit(0), F.size(vec_q) - 1),
                component(p),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj_dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    n_projections: int = 16,
    band_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates share at least one signature band with
    the query (equi-join on (band, key) — linear shuffle, no cross join),
    then exact cosine rerank within candidates."""
    n_bands = n_projections // band_bits

    def with_bands(df: DataFrame, role: str) -> DataFrame:
        # signature (n_projections zip_with/aggregate HOF folds) and band
        # split are pure unresolved trees — built once per JVM, per role
        # (guide §1.2/§5: this was ~1.5 s/call of py4j construction)
        head = cached_exprs(
            ("lsh_head", vec_col, id_col, role, n_projections),
            lambda: [
                F.col(id_col).alias(f"{role}_id"),
                quantize(F.col(vec_col)).alias(f"{role}v"),
                # per-vector norm folded once here, not per candidate pair
                # (cosine_with_norms — HOF folds are interpreted)
                dot(quantize(F.col(vec_col)), quantize(F.col(vec_col))).alias(
                    f"__{role}n2"
                ),
                lsh_signature(
                    quantize(F.col(vec_col)), n_projections=n_projections
                ).alias("__sig"),
            ],
        )
        band_col = cached_exprs(
            ("lsh_bands", n_bands, band_bits),
            lambda: F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftrightunsigned(F.col("__sig"), b * band_bits)
                            .bitwiseAND(F.lit((1 << band_bits) - 1))
                            .alias("key"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        )
        return df.select(*head).select(
            f"{role}_id", f"{role}v", f"__{role}n2", band_col
        ).select(
            f"{role}_id",
            f"{role}v",
            f"__{role}n2",
            F.col("bb.band"),
            F.col("bb.key"),
        )

    qb = F.broadcast(with_bands(queries, "query"))
    cb = with_bands(corpus, "neighbor")
    # the norms ride through the candidate distinct (functionally dependent
    # on the vectors, so the distinct's pair set is unchanged)
    cand = (
        cb.join(qb, ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id", "queryv", "neighborv",
            "__queryn2", "__neighborn2",
        )
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_with_norms(
            dot(F.col("queryv"), F.col("neighborv")),
            F.col("__queryn2"),
            F.col("__neighborn2"),
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer → per-cluster inverted
# lists → nprobe-bounded search. The scale path when sign-projection LSH
# recall isn't enough: the corpus pass is linear with broadcast centroids,
# and search touches only nprobe clusters.
def _fdot(a: Column, b: Column) -> Column:
    """Double dot product (centroids are fractional after k-means updates)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _fcosine(a: Column, b: Column) -> Column:
    return _fdot(a, b) / (F.sqrt(_fdot(a, a)) * F.sqrt(_fdot(b, b)))


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """Pack (cluster, __c) rows into ONE row holding an array of
    (cluster, centroid, norm) structs — broadcast-crossJoined onto vectors so
    cluster routing is a pure map stage (no shuffle, no window)."""
    return centroids.agg(
        F.collect_list(
            F.struct(
                F.col("cluster"),
                F.col("__c"),
                F.sqrt(_fdot(F.col("__c"), F.col("__c"))).alias("__cn"),
            )
        ).alias("__cs")
    )


def _best_cluster(v: Column) -> Column:
    """argmax over the packed centroid array of dot(v, c)/||c|| — for a fixed
    v this ranks clusters identically to cosine (||v|| is constant), without
    computing the vector norm. Ties break to the smallest cluster id."""
    return F.array_max(
        F.transform(
            F.col("__cs"),
            lambda c: F.struct(
                (_fdot(v, c.getField("__c")) / c.getField("__cn")).alias("__sim"),
                (-c.getField("cluster")).alias("__negc"),
            ),
        )
    )


def ivf_fit_assign(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    iters: int = 2,
    fit_mod: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Mini k-means on the quantized vectors → (assignments, centroids).

    Deterministic seeding: the n_clusters rows with smallest xxhash64(id)
    (a hash-sample — no RNG, reproducible across runs/partitionings).
    Scale shape: Lloyd iterations optionally run on a deterministic hash
    sample (``fit_mod``: keep rows with xxhash64(id) % fit_mod == 0 — at
    100 TB you fit the quantizer on a sample, never the full corpus), cluster
    routing is a shuffle-free map stage over a broadcast centroid array, and
    only the per-cluster mean update shuffles (map-side partials:
    n_clusters × dim rows per partition). Every Lloyd iteration ends in an
    eager localCheckpoint so downstream consumers read the fit as data
    instead of re-running it (the round-1 10× run-to-run variance bug).
    """
    vecs = corpus.select(
        F.col(id_col).alias("__vid"),
        F.transform(quantize(F.col(vec_col)), lambda x: x.cast("double")).alias("__v"),
    )
    fit = (
        vecs.filter(F.pmod(F.xxhash64("__vid"), F.lit(fit_mod)) == 0)
        if fit_mod and fit_mod > 1
        else vecs
    )
    seeds = (
        fit.orderBy(F.xxhash64(F.col("__vid")))
        .limit(n_clusters)
        .select(
            F.row_number()
            .over(Window.orderBy(F.xxhash64(F.col("__vid"))))
            .alias("cluster"),
            F.col("__v").alias("__c"),
        )
    )
    centroids = seeds.localCheckpoint()
    # one tiny action to learn the dimensionality, then each Lloyd update is
    # a SINGLE partial+final aggregation (dim indexed avgs per cluster) —
    # no posexplode row blowup, no second shuffle
    dim = len(fit.select("__v").head()[0])
    # the argmax-over-centroids tree (HOF transform with dot-product folds)
    # and the per-dimension mean array are pure unresolved trees consumed
    # by every Lloyd iteration plus the final assignment — build each once
    best_cluster = cached_exprs(
        ("ivf_best",),
        lambda: (-_best_cluster(F.col("__v")).getField("__negc")).alias(
            "cluster"
        ),
    )
    mean_vec = cached_exprs(
        ("ivf_mean", dim),
        lambda: F.array(*[F.avg(F.col("__v")[i]) for i in range(dim)]).alias(
            "__c"
        ),
    )
    for _ in range(iters):
        assigned = (
            fit.crossJoin(F.broadcast(_centroid_array(centroids)))
            .select("__v", best_cluster)
        )
        centroids = (
            assigned.groupBy("cluster").agg(mean_vec)
        ).localCheckpoint()
    # final assignment over the FULL corpus (map-only), materialized once
    assignments = (
        vecs.crossJoin(F.broadcast(_centroid_array(centroids)))
        .select("__vid", best_cluster)
        .localCheckpoint()
    )
    return assignments, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    n_clusters: int = 16,
    nprobe: int = 4,
    fit_mod: int | None = None,
) -> DataFrame:
    """IVF search: route each query to its nprobe nearest centroids, rerank
    exactly (integer cosine) within those inverted lists only. Routing is a
    map-only stage over the broadcast centroid array (top-nprobe via
    array_sort + slice, no window shuffle)."""
    assignments, centroids = ivf_fit_assign(
        corpus, vec_col=vec_col, id_col=id_col, n_clusters=n_clusters, fit_mod=fit_mod
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        quantize(F.col(vec_col)).alias("qv"),
        F.transform(quantize(F.col(vec_col)), lambda x: x.cast("double")).alias("qvd"),
    )
    scored_arr = F.transform(
        F.col("__cs"),
        lambda c: F.struct(
            (_fdot(F.col("qvd"), c.getField("__c")) / c.getField("__cn")).alias("__sim"),
            (-c.getField("cluster")).alias("__negc"),
        ),
    )
    routed = (
        qv.crossJoin(F.broadcast(_centroid_array(centroids)))
        .select(
            "query_id",
            "qv",
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(scored_arr)), 1, nprobe),
                    lambda s: -s.getField("__negc"),
                )
            ).alias("cluster"),
        )
    )
    # per-vector norms folded once per side (cosine_with_norms — HOF folds
    # are interpreted, so per-pair norm re-evaluation tripled rerank cost)
    cands = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    ).withColumn("__cn2", dot(F.col("cv"), F.col("cv"))).join(
        assignments, F.col("neighbor_id") == F.col("__vid")
    )
    routed = routed.withColumn("__qn2", dot(F.col("qv"), F.col("qv")))
    scored = (
        routed.join(cands, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_with_norms(
                dot(F.col("qv"), F.col("cv")), F.col("__qn2"), F.col("__cn2")
            ).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )
