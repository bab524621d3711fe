"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of every choice here):

- **Exact dedup** is one hash shuffle on the dedup key — at 100 TB, group by
  a 64-bit content hash (xxhash64) instead of the raw text so shuffle rows
  are ~16 bytes, then keep min(id) per group. No driver-side state.
- **MinHash+LSH** avoids the O(n²) all-pairs comparison: per-doc signatures
  (narrow, num_perm × 8 bytes), banded into buckets; only same-bucket pairs
  are candidates (equi-join on the band key — a normal shuffle join that
  scales linearly with bucket occupancy); candidates are verified with true
  Jaccard. Band count / rows-per-band tune the S-curve.
- **SimHash** gives a single 64-bit signature; near-dup = small Hamming
  distance. Bucketing on bit-bands makes the candidate join equi again.
- All hash functions are Spark-side xxhash64 (JVM, codegen'd) — no Python
  in the hot path anywhere in this module.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import types as T

from verax_spark.operators._exprcache import cached_exprs


# ---------------------------------------------------------------------------
# Tokenize / shingle helpers (pure Column expressions — JVM-side)
def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles as an array<string> (order-insensitive set).

    Built with transform over an index sequence — no UDF. Sorted for
    deterministic downstream use.
    """
    toks = tokens(text)
    # O(L) construction: zip the token array with its shifted slices.
    # (transform-over-index with element_at re-evaluates the split per
    # element — O(L²), measured ~20× slower on 100-word docs.)
    sh = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.array_sort(F.array_distinct(F.slice(sh, 1, k)))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two array-set columns, computed as an integer
    ratio (size of intersection / size of union) in double — deterministic."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / union.cast("double")


# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content hash.

    Shuffles (hash, id) pairs only; the winning ids are joined back to
    recover full rows (semi join — at scale this beats carrying wide rows
    through the aggregation shuffle).
    """
    h = F.xxhash64(F.col(text_col))
    winners = (
        df.select(h.alias("__h"), F.col(id_col))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    threshold: float = 0.6,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs → (id_a, id_b, jaccard), via an inverted
    index: explode shingles, self-join on the shingle, count shared shingles
    per pair, then jaccard = ∩ / (|A| + |B| - ∩).

    Only pairs sharing ≥1 shingle are ever materialized — pairs with zero
    intersection have jaccard 0 and can't pass any positive threshold — so
    the cost is Σ_s freq(s)² over shingles, not |docs|² (an all-pairs
    formulation measured ~20× slower at sf0.1 and diverges quadratically).
    Optional block_col further restricts pairs to equal-block docs.
    """
    # shingle ONCE and cut lineage at the array relation: word_shingles is
    # a chain of zip_with/array_distinct/array_sort HOFs that Spark only
    # INTERPRETS (no codegen), so it is the dominant per-row cost — the
    # previous shape materialized only the (id, count) relation and re-ran
    # the whole shingle construction for the explode branch (2x the HOF
    # work; measured 2.8 -> 2.1s at sf0.1). Both consumers now read the
    # materialized arrays.
    shingled = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        word_shingles(F.col(text_col), n).alias("__sh"),
    ).localCheckpoint(eager=True)
    sizes = shingled.select(F.col(id_col), F.size("__sh").alias("__n"))
    exploded = shingled.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.explode("__sh").alias("__s"),
    )
    # posting lists: one groupBy on the shingle, then pair generation inside
    # the row (sorted ids → ordered pairs) — one shuffle fewer than a
    # self-join, and skew is bounded by max document frequency per shingle.
    posting_keys = ["__s"] + ([block_col] if block_col else [])
    postings = exploded.groupBy(*posting_keys).agg(
        F.sort_array(F.collect_list(id_col)).alias("__ids")
    )
    ids = F.col("__ids")
    pair_array = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    inter = (
        postings.select(F.explode(pair_array).alias("__p"))
        .select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"))
    jac = F.col("__inter").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__inter")
    ).cast("double")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, *, n: int = 3, num_perm: int = 64
) -> DataFrame:
    """(id, mh0..mh{num_perm-1}): MinHash signature columns per document.

    Shape chosen for scale: shingles are computed ONCE, exploded to
    (id, shingle) rows, and each permutation is a flat scalar
    min(xxhash64(seed, shingle)) aggregate — whole-stage-codegen'd, with
    map-side partial mins before the single shuffle on id. (A per-row
    array-lambda formulation recomputes the shingle array per permutation
    and defeats codegen — ~50× slower, measured.)
    """
    exploded = df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("__s")
    )
    # num_perm min/xxhash64 aggregate terms: pure unresolved-column trees,
    # built once per JVM (measured ~0.3 s/call of py4j otherwise)
    aggs = cached_exprs(
        ("mh_aggs", num_perm),
        lambda: [
            F.min(F.xxhash64(F.lit(i), F.col("__s"))).alias(f"mh{i}")
            for i in range(num_perm)
        ],
    )
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: "int | None" = 256,
) -> DataFrame:
    """MinHash → LSH banding → candidate pairs → exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) for verified near-dup pairs. The only
    quadratic work is within LSH buckets; everything else is linear maps
    and shuffles on (id) / (band, bucket) keys.

    Hot-bucket guard (r09, VERDICT r08 #5; reworked r10 per ADVICE r09):
    a degenerate corpus (mass-duplicated boilerplate, empty strings)
    lands one giant LSH bucket and the within-bucket self-join goes
    quadratic on it. Buckets larger than ``max_bucket_size`` switch to a
    two-level scheme, linear in the bucket size:

    1. members are SUB-GROUPED by their full MinHash signature; within a
       sub-group every member gets a star edge to the sub-group min.
       Identical signatures mean estimated Jaccard 1.0, so these edges
       pass the exact verify for true duplicates — the mass-duplication
       case that motivates the guard keeps EXACT all-pairs semantics
       (same surviving set, via the representative).
    2. across sub-groups, the DISTINCT-SIGNATURE REPRESENTATIVES run
       all-pairs (one row per distinct signature — small unless the
       bucket is pathological); if even the representative count exceeds
       ``max_bucket_size``, the representatives themselves fall back to
       star edges.

    Known recall loss (documented, not hidden): in a hot bucket, two
    members of DIFFERENT signature sub-groups are only linked through
    their representatives — if A~B pass the threshold but neither passes
    against its representative, the A-B pair is dropped. Exact all-pairs
    semantics everywhere requires ``max_bucket_size=None`` (opt-out),
    which re-admits the quadratic worst case.
    """
    if max_bucket_size is None:
        max_bucket_size = 1 << 62  # opt-out: exact all-pairs everywhere
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, text_col, id_col, n=n, num_perm=num_perm)
    # band key = hash of the band's slice of the signature; the select
    # list (signature fingerprint + bands×rows_per_band struct array) is a
    # pure unresolved tree — built once per JVM (guide §1.2/§5 driver work)
    band_cols = cached_exprs(
        ("mh_bands", id_col, num_perm, bands),
        lambda: [
            F.col(id_col),
            # full-signature fingerprint for hot-bucket sub-grouping: equal
            # __sig ⇒ identical 64-perm signature ⇒ estimated Jaccard 1.0
            F.xxhash64(*[F.col(f"mh{i}") for i in range(num_perm)]).alias(
                "__sig"
            ),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.concat_ws(
                                    ",",
                                    *[
                                        F.col(f"mh{b * rows_per_band + r}")
                                        for r in range(rows_per_band)
                                    ],
                                )
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ],
    )
    band_entries_plan = sig.select(*band_cols).select(
        F.col(id_col), F.col("__sig"), F.col("bb.band"), F.col("bb.bucket")
    )
    # ONE (band, bucket) exchange serves the whole guard computation
    # (r10, guide §2.4): the windows stack over a single shuffle and the
    # lineage cut moves AFTER them. The r09 shape checkpointed the
    # PRE-window entries and re-derived the windows in every consumer —
    # plan-verified as 6 Exchange hashpartitioning(band,bucket) nodes and
    # 12 Window evaluations of the same relation (self-join sides, hot
    # branches, rep re-windows). Post-window checkpointing leaves ONE
    # exchange + 3 stacked Window ops, and the checkpointed relation
    # keeps its (band,bucket) partitioning, so every downstream
    # self-join on (band,bucket) needs no exchange at all. The
    # materialized relation stays narrow: ~6 longs x bands per document.
    # (Without any cut, the signature aggregation — explode + num_perm
    # min-aggs over all text — would execute once per consumer; Catalyst
    # emits no ReusedExchange here, verified on the physical plan.)
    # window select lists: pure trees over (id_col) — cached like the band
    # columns (the two stacked selects cost ~0.3 s/run of py4j otherwise)
    sized_cols1 = cached_exprs(
        ("mh_sized1", id_col),
        lambda: [
            F.col(id_col),
            F.col("__sig"),
            F.col("band"),
            F.col("bucket"),
            F.count(F.lit(1))
            .over(Window.partitionBy("band", "bucket"))
            .alias("__bsz"),
            F.min(id_col)
            .over(Window.partitionBy("band", "bucket", "__sig"))
            .alias("__smin"),
        ],
    )
    sized_cols2 = cached_exprs(
        ("mh_sized2", id_col),
        lambda: [
            F.col("*"),
            # rep-set quantities, derived bucket-wide instead of from a
            # separate reps-only window pass: the reps are exactly the
            # sub-group minima, so |reps| = count of rows equal to their
            # sub-group min, and min-over-reps = bucket-wide min id (the
            # bucket's global min id is always its own sub-group's min).
            F.sum((F.col(id_col) == F.col("__smin")).cast("int"))
            .over(Window.partitionBy("band", "bucket"))
            .alias("__nsig"),
            F.min(id_col)
            .over(Window.partitionBy("band", "bucket"))
            .alias("__rmin"),
        ],
    )
    sized = (
        band_entries_plan.select(*sized_cols1)
        .select(*sized_cols2)
        .localCheckpoint(eager=True)
    )
    normal = sized.filter(F.col("__bsz") <= max_bucket_size).select(
        id_col, "band", "bucket"
    )

    def _self_pairs(rel: DataFrame) -> DataFrame:
        return (
            rel.alias("x")
            .join(
                rel.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
            )
            .select(
                F.col(f"x.{id_col}").alias("id_a"),
                F.col(f"y.{id_col}").alias("id_b"),
            )
        )

    all_pairs = _self_pairs(normal)
    hot = sized.filter(F.col("__bsz") > max_bucket_size)
    # level 1: identical-signature members star to their sub-group min
    dup_star = hot.filter(F.col(id_col) > F.col("__smin")).select(
        F.col("__smin").alias("id_a"), F.col(id_col).alias("id_b")
    )
    # level 2: one representative per distinct signature; all-pairs among
    # them, star fallback if even the representative set is oversized
    # (__nsig/__rmin precomputed bucket-wide above — no reps-only window)
    reps = hot.filter(F.col(id_col) == F.col("__smin"))
    rep_pairs = _self_pairs(
        reps.filter(F.col("__nsig") <= max_bucket_size).select(
            id_col, "band", "bucket"
        )
    )
    rep_star = reps.filter(
        (F.col("__nsig") > max_bucket_size) & (F.col(id_col) > F.col("__rmin"))
    ).select(F.col("__rmin").alias("id_a"), F.col(id_col).alias("id_b"))
    cand = (
        all_pairs.unionByName(dup_star)
        .unionByName(rep_pairs)
        .unionByName(rep_star)
        .distinct()
    )
    # Exact-Jaccard verification needs shingles only for CANDIDATE ids: one
    # doc scan + semi-join prune, materialized small, consumed twice — never
    # a full-corpus shingle materialization, never a second corpus scan.
    cand_ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    sh_cand = (
        df.select(F.col(id_col), word_shingles(F.col(text_col), n).alias("__sh"))
        .join(cand_ids, id_col, "left_semi")
        .localCheckpoint(eager=True)
    )
    sh_a = sh_cand.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("sh_a"))
    sh_b = sh_cand.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_by_pairs(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Leader dedup: drop every row whose id appears as the *larger* id of a
    near-dup pair (single-pass; not transitive closure — at scale, iterate
    or run connected components if chains matter)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, *, bits: int = 64
) -> DataFrame:
    """(id, __sim): 64-bit SimHash of the token multiset per document.

    Per token: xxhash64; each bit lane accumulates +1/-1 votes; the sign of
    the lane sum sets the output bit. Same explode+groupBy shape as MinHash
    (one token pass, flat codegen'd aggregates, map-side partials)."""
    exploded = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).select(F.col(id_col), F.xxhash64(F.col("__t")).alias("__h"))
    # bits lane aggregates + the bit-reassembly fold: pure unresolved
    # trees, built once per JVM (~0.6 s/call of py4j otherwise)
    lane_aggs = cached_exprs(
        ("sim_lanes", bits),
        lambda: [
            F.sum(
                F.when(
                    F.col("__h").bitwiseAND(F.shiftleft(F.lit(1).cast("bigint"), b))
                    != 0,
                    1,
                ).otherwise(-1)
            ).alias(f"lane{b}")
            for b in range(bits)
        ],
    )
    lanes = exploded.groupBy(id_col).agg(*lane_aggs)

    def _fold():
        sim = F.lit(0).cast("bigint")
        for b in range(bits):
            sim = sim + F.when(
                F.col(f"lane{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
            ).otherwise(0)
        return sim

    sim = cached_exprs(("sim_fold", bits), _fold)
    return lanes.select(F.col(id_col), sim.alias("__sim"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 8,
    band_bits: int = 16,
    max_bucket_size: "int | None" = 256,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, with bit-band LSH
    blocking: signatures agreeing on any 16-bit band become candidates
    (guaranteed to catch distance < 64/band_bits bands).

    Hot-bucket guard (two-level, same scheme and same documented recall
    loss as minhash_lsh_pairs): buckets over ``max_bucket_size`` sub-group
    by the FULL 64-bit SimHash — identical-signature members star to
    their sub-group min at Hamming distance 0 (always passes the verify,
    so the mass-duplicate degenerate case keeps exact semantics), and the
    distinct-signature representatives run all-pairs (star fallback if
    even they exceed the bound). Cross-sub-group member pairs are only
    reachable through representatives; ``max_bucket_size=None`` opts out
    into exact (quadratic worst-case) all-pairs."""
    if max_bucket_size is None:
        max_bucket_size = 1 << 62
    sig = simhash_signatures(df, text_col, id_col)
    bands = sig.select(
        F.col(id_col),
        F.col("__sim"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("__sim"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("key"),
                    )
                    for b in range(64 // band_bits)
                ]
            )
        ).alias("bb"),
    ).select(F.col(id_col), F.col("__sim"), F.col("bb.band"), F.col("bb.key"))
    # ONE (band, key) exchange + stacked windows, checkpoint AFTER them
    # (same reshape as minhash_lsh_pairs: the pre-window checkpoint was
    # re-shuffled and re-windowed once per consumer; the post-window
    # checkpoint keeps its (band,key) partitioning so the self-joins add
    # no exchange). Without a cut the signature aggregation would run
    # once per consumer (no ReusedExchange, plan-verified).
    # sub-group hot buckets by the full signature: identical __sim ⇒
    # Hamming 0 ⇒ the star edge always survives the verify.
    # Window select lists cached as pure trees (same as minhash_lsh_pairs).
    sh_cols1 = cached_exprs(
        ("sh_sized1", id_col),
        lambda: [
            F.col(id_col),
            F.col("__sim"),
            F.col("band"),
            F.col("key"),
            F.count(F.lit(1))
            .over(Window.partitionBy("band", "key"))
            .alias("__bsz"),
            F.min(id_col)
            .over(Window.partitionBy("band", "key", "__sim"))
            .alias("__smin"),
        ],
    )
    sh_cols2 = cached_exprs(
        ("sh_sized2", id_col),
        lambda: [
            F.col("*"),
            # rep-set quantities bucket-wide (reps = sub-group minima):
            # |reps| = count of rows equal to their sub-group min;
            # min-over-reps keeps the representative's SIGNATURE via the
            # (id, sim) struct min — the bucket's global min id is a rep,
            # and ids are unique within a bucket, so the struct min is
            # exactly the min-id rep with its sim.
            F.sum((F.col(id_col) == F.col("__smin")).cast("int"))
            .over(Window.partitionBy("band", "key"))
            .alias("__nsig"),
            F.min(F.struct(F.col(id_col).alias("i"), F.col("__sim").alias("s")))
            .over(Window.partitionBy("band", "key"))
            .alias("__rmin"),
        ],
    )
    sized = (
        bands.select(*sh_cols1).select(*sh_cols2).localCheckpoint(eager=True)
    )
    ham = F.bit_count(F.col("x.__sim").bitwiseXOR(F.col("y.__sim")))

    def _self_pairs(rel: DataFrame) -> DataFrame:
        return (
            rel.alias("x")
            .join(
                rel.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key"))
                & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
            )
            .select(
                F.col(f"x.{id_col}").alias("id_a"),
                F.col(f"y.{id_col}").alias("id_b"),
                ham.alias("hamming"),
            )
        )

    normal = sized.filter(F.col("__bsz") <= max_bucket_size)
    all_pairs = _self_pairs(normal)
    hot = sized.filter(F.col("__bsz") > max_bucket_size)
    dup_star = hot.filter(F.col(id_col) > F.col("__smin")).select(
        F.col("__smin").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.lit(0).cast("int").alias("hamming"),
    )
    reps = hot.filter(F.col(id_col) == F.col("__smin"))
    rep_pairs = _self_pairs(
        reps.filter(F.col("__nsig") <= max_bucket_size)
    )
    rep_star = reps.filter(
        (F.col("__nsig") > max_bucket_size)
        & (F.col(id_col) > F.col("__rmin.i"))
    ).select(
        F.col("__rmin.i").alias("id_a"),
        F.col(id_col).alias("id_b"),
        F.bit_count(F.col("__rmin.s").bitwiseXOR(F.col("__sim"))).alias(
            "hamming"
        ),
    )
    return (
        all_pairs.unionByName(dup_star)
        .unionByName(rep_pairs)
        .unionByName(rep_star)
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    check_every: int = 2,
    driver_gate: int | None = None,
) -> DataFrame:
    """Transitive closure of near-dup pairs → (id, component) with component
    = min id reachable. Label-propagation fixpoint (the small-star/large-star
    family): each iteration joins labels across edges and keeps the min.

    Scale notes: per iteration one shuffle join + one groupBy; lineage is cut
    with localCheckpoint every iteration so the DAG doesn't grow with the
    diameter (the classic iterative-Spark trap); iterations are bounded by
    the cluster diameter, typically ≤ log n for dedup graphs. Convergence is
    probed only every ``check_every`` iterations, against the CHECKPOINTED
    labels (a per-iteration changed-flag column, so the probe scans
    materialized data instead of re-running a labels⋈labels join — the probe
    job is near-free and at most check_every-1 extra iterations run).

    Small-graph fast path (r10, guide §2.4/§5): below ``driver_gate`` edges
    (default 100k, env VERAX_CC_DRIVER_GATE) the closure is solved with
    union-find in the driver — a dedup edge list is tiny relative to the
    corpus (only docs in near-dup pairs appear), while the iterative path
    pays ~4 sequential Spark jobs per diameter step in pure scheduling
    latency. The collect is BOUNDED BY CONSTRUCTION: the probe reads
    ``limit(gate+1)`` of the RAW (pre-distinct) pair stream (≤ 100k 2-field
    rows ≈ a few MB via Arrow) — so the gate is a raw-row bound, not a
    distinct-edge bound: duplicate candidate pairs (e.g. the same pair from
    multiple MinHash bands) count against it, and a dup-heavy small graph
    may conservatively take the distributed path. One extra row past the
    gate falls back to the distributed fixpoint — identical results
    (component = min reachable id) either way, property-tested in
    tests/test_pipeline.py.
    """
    if driver_gate is None:
        driver_gate = int(os.environ.get("VERAX_CC_DRIVER_GATE", 100_000))
    raw = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    # Gate probe BEFORE any checkpoint (r10 session 5): the probe itself
    # executes the pairs DAG with an early-terminating limit, so in the
    # small-graph case the collected rows ARE the whole edge list and the
    # separate distinct+checkpoint job (plus its broadcast-build jobs) is
    # never paid. Duplicate/undirected duplicates are harmless to
    # union-find, so no distinct is needed on this path. Only the
    # distributed fixpoint below needs the deduplicated, materialized,
    # re-partitioned edge relation.
    head = raw.limit(driver_gate + 1).toPandas() if driver_gate > 0 else None
    if head is not None and len(head) <= driver_gate:
        spark = pairs.sparkSession
        parent = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(head["src"], head["dst"]):
            a = a.item() if hasattr(a, "item") else a
            b = b.item() if hasattr(b, "item") else b
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN so the final representative is the min id
                # reachable — bit-identical to the fixpoint's answer
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        import pandas as pd

        rows = [(x, find(x)) for x in parent]
        schema = T.StructType(
            [
                T.StructField("id", raw.schema["src"].dataType),
                T.StructField("component", raw.schema["src"].dataType),
            ]
        )
        if not rows:
            return spark.createDataFrame([], schema)
        # Arrow-backed createDataFrame (list-of-tuples builds a pickled
        # Python RDD whose every action pays a Python-worker launch —
        # measured 6s/collect for 250 rows on this sandbox; the Arrow path
        # converts JVM-side) + coalesce(1): the map is ≤ gate rows, the
        # default would spread it over defaultParallelism tasks.
        pdf = pd.DataFrame(rows, columns=["id", "component"])
        return spark.createDataFrame(pdf, schema).coalesce(1)
    # Materialize the edge list ONCE before iterating: `pairs` usually
    # carries a whole candidate-generation DAG (MinHash banding etc.), and
    # without this cut every iteration's join would re-execute that entire
    # upstream pipeline — the dominant cost, not the propagation itself.
    # SINGLE-DIRECTION first (r10): a doubled-then-distinct form runs the
    # whole pairs DAG twice inside the checkpoint job; the swap to both
    # directions happens after the cut, reading materialized rows.
    e1 = raw.distinct().localCheckpoint(eager=True)
    # repartition by src BEFORE the cut (r10): the distinct leaves the
    # edge list (src,dst)-partitioned, which no iteration can reuse — the
    # edges⋈labels join then re-shuffled the edges EVERY iteration. One
    # extra exchange here makes the checkpoint src-partitioned, which
    # co-partitions with the labels relation (id-partitioned, same hash,
    # same partition count), so each iteration pays only its groupBy(dst)
    # exchange: 1 shuffle per iteration instead of 2 (guide §2.4).
    edges = (
        e1.unionAll(e1.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for i in range(max_iter):
        # neighbor labels propagated across edges
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id2"))
            .agg(F.min("component").alias("nbr_component"))
        )
        nbr = F.coalesce("nbr_component", F.col("component"))
        new_labels = (
            labels.join(neighbor_min, labels.id == F.col("id2"), "left")
            .select(
                "id",
                F.least(F.col("component"), nbr).alias("component"),
                (nbr < F.col("component")).alias("__ch"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            if labels.filter(F.col("__ch")).limit(1).count() == 0:
                break
    return labels.select("id", "component")


def dedup_transitive(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Cluster-aware dedup: keep the min id of each connected component
    (vs dedup_by_pairs' single-pass leader rule, which can keep one doc of a
    chain a-b-c when only (a,b),(b,c) matched)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection.
def embedding_cosine_pairs(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_projections: int = 16,
    band_bits: int = 4,
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine similarity →
    (id_a, id_b, cosine) with id_a < id_b and cosine ≥ threshold.

    Arithmetic is exact-integer (floor(x·2²⁰) quantization, bigint dot
    products) so the cosine — and therefore the threshold comparison — is
    bit-identical on any engine/partitioning (the module's determinism rule).

    Scale paths:

    - ``exact=False`` (default, the 100 TB path): sign-projection LSH bands
      generate candidates via a banded equi-join — each row appears once per
      band, only same-bucket pairs are compared, never all-pairs — then the
      exact cosine verifies each candidate. Same banded shape as
      minhash_lsh_pairs; recall governed by n_projections/band_bits
      (candidates must agree on ALL bits of at least one band).
    - ``exact=True``: all-pairs verification, O(n²) — the correctness oracle
      baseline for tests and small relations only.
    """
    from verax_spark.operators.similarity import (
        cosine_with_norms,
        dot,
        lsh_signature,
        quantize,
    )

    # per-vector norm folded ONCE here (cosine_with_norms: zip_with/
    # aggregate folds run interpreted — per-pair re-evaluation of dot(v,v)
    # made the verify 3 interpreted O(dim) folds per pair; measured 1.6s →
    # 0.6s on the 250-vector exact path at sf0.1)
    v = df.select(
        F.col(id_col).alias("__id"), quantize(F.col(vec_col)).alias("__qv")
    ).withColumn("__n2", dot(F.col("__qv"), F.col("__qv")))
    if exact:
        a = v.select(
            F.col("__id").alias("id_a"),
            F.col("__qv").alias("__va"),
            F.col("__n2").alias("__na2"),
        )
        b = v.select(
            F.col("__id").alias("id_b"),
            F.col("__qv").alias("__vb"),
            F.col("__n2").alias("__nb2"),
        )
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        n_bands = n_projections // band_bits
        # the sign-projection signature (n_projections zip_with/aggregate
        # HOF folds — the expensive tree) and the band-split explode are
        # pure unresolved trees, built once per JVM; the two-Project shape
        # (signature aliased below the explode) is kept so the signature
        # is evaluated once per row, not once per band
        sig_col = cached_exprs(
            ("emb_sigcol", n_projections),
            lambda: lsh_signature(F.col("__qv"), n_projections=n_projections),
        )
        band_col = cached_exprs(
            ("emb_bands", n_bands, band_bits),
            lambda: F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(band).alias("band"),
                            F.shiftrightunsigned(F.col("__sig"), band * band_bits)
                            .bitwiseAND(F.lit((1 << band_bits) - 1))
                            .alias("key"),
                        )
                        for band in range(n_bands)
                    ]
                )
            ).alias("bb"),
        )
        sig = v.withColumn("__sig", sig_col).select(
            "__id", "__qv", "__n2", band_col
        ).select("__id", "__qv", "__n2", F.col("bb.band"), F.col("bb.key"))
        # materialize once: the self-join would recompute the n_projections
        # signature dot products for both sides (no ReusedExchange).
        # Repartition on the join key first (r10) so the checkpoint is
        # (band,key)-partitioned and the banded self-join adds no
        # exchange on either side.
        sig = sig.repartition("band", "key").localCheckpoint(eager=True)
        left = sig.select(
            F.col("__id").alias("id_a"),
            F.col("__qv").alias("__va"),
            F.col("__n2").alias("__na2"),
            "band",
            "key",
        )
        right = sig.select(
            F.col("__id").alias("id_b"),
            F.col("__qv").alias("__vb"),
            F.col("__n2").alias("__nb2"),
            "band",
            "key",
        )
        # norms ride through the distinct (functionally dependent on the
        # vectors — the candidate pair set is unchanged)
        cand = (
            left.join(right, ["band", "key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "__va", "__vb", "__na2", "__nb2")
            .distinct()
        )
    return (
        cand.select(
            "id_a",
            "id_b",
            cosine_with_norms(
                dot(F.col("__va"), F.col("__vb")), F.col("__na2"), F.col("__nb2")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    broadcast_test: bool = True,
) -> DataFrame:
    """Train/test decontamination: flag every train document sharing at
    least one n-word shingle with ANY test document (the GPT-3 / Pile
    style benchmark-overlap check).

    Scale design: the test corpus's distinct shingles are usually tiny
    (benchmark suites), so they broadcast and the train side streams map-
    only through a broadcast-hash semi-ish join — no shuffle of the 100 TB
    side. With ``broadcast_test=False`` it degrades to a shuffle equi-join
    on the shingle (the banded inverted-index pattern used by
    ngram_jaccard_pairs). Output: (train_id, n_shared, contaminated) for
    every train row, zeros preserved.
    """
    t_sh = train.select(
        F.col(id_col).alias("train_id"),
        F.explode(word_shingles(F.lower(F.col(text_col)), n)).alias("sh"),
    )
    s_sh = test.select(
        F.explode(word_shingles(F.lower(F.col(text_col)), n)).alias("sh")
    ).distinct()
    if broadcast_test:
        s_sh = F.broadcast(s_sh)
    hits = (
        t_sh.join(s_sh, "sh")
        .groupBy("train_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
    )
    return (
        train.select(F.col(id_col).alias("train_id"))
        .join(hits, "train_id", "left")
        .select(
            "train_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
