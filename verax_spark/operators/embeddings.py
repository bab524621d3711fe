"""Embedding-column transformations for training-data pipelines.

Complements operators/similarity.py (search) with the *preparation* ops a
100 TB embedding pipeline needs: unit-normalization, int8 storage
quantization, random-projection dimensionality reduction, and per-dimension
corpus statistics (for whitening / drift monitoring).

Scale design:
- Everything row-local is pure Column expressions (transform / zip_with /
  aggregate) — JVM codegen, embarrassingly parallel, no shuffle.
- The only shuffle is dimension_stats' groupBy(dim), which is map-side
  partially aggregated: post-shuffle traffic is partitions × dim rows, not
  rows × dim.
- The random-projection sign matrix is a closed-form integer formula (no
  stored model, no broadcast): sign(i, j) = +1 if (i·31 + j·17) mod 2 = 0
  else −1. Any engine reproduces it with plain arithmetic — which is what
  makes the op oracle-able (the reference's tests likewise re-execute a
  reference plan rather than trusting stored artifacts,
  axiom/optimizer/tests/QueryTestBase.h:70-95).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def l2_norm(vec: Column) -> Column:
    """Euclidean norm of an array<float|double> as double."""
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(vec: Column) -> Column:
    """Scale to unit L2 norm; the zero vector stays zero (nullif guard)."""
    n = F.nullif(l2_norm(vec), F.lit(0.0))
    return F.transform(
        vec, lambda x: F.coalesce(x.cast("double") / n, F.lit(0.0))
    )


def int8_quantize(vec: Column) -> Column:
    """Per-vector symmetric int8 quantization.

    Returns struct(scale double, q array<int>): scale = max(|x|)/127,
    q[i] = round(x[i]/scale) ∈ [−127, 127]. The all-zero vector gets
    scale 0 and zeros. round() is half-up on doubles — the same closed
    form any engine computes.
    """
    mx = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = mx / F.lit(127.0)
    safe = F.nullif(scale, F.lit(0.0))
    q = F.transform(
        vec,
        lambda x: F.coalesce(
            F.round(x.cast("double") / safe, 0), F.lit(0.0)
        ).cast("int"),
    )
    return F.struct(scale.alias("scale"), q.alias("q"))


def int8_dequantize(packed: Column) -> Column:
    """Inverse of int8_quantize: x̂[i] = q[i] · scale (array<double>)."""
    return F.transform(
        packed["q"], lambda v: v.cast("double") * packed["scale"]
    )


def _proj_sign(i: Column, j: int) -> Column:
    # deterministic ±1 from closed-form integer arithmetic — portable to
    # any engine, no stored projection matrix
    return F.when((i * 31 + F.lit(j) * 17) % 2 == 0, F.lit(1.0)).otherwise(
        F.lit(-1.0)
    )


def random_projection(vec: Column, out_dim: int) -> Column:
    """Signed random projection to out_dim dims (array<double>).

    y[j] = Σ_i x[i] · sign(i, j). Unscaled (callers normalizing afterward
    don't need the 1/√d factor). O(d · out_dim) per row, no shuffle.
    """
    idx = F.sequence(F.lit(0), F.size(vec) - 1)

    def term(j):
        # closure (a default arg would change the lambda's visible arity)
        return lambda x, i: x.cast("double") * _proj_sign(i, j)

    return F.array(
        *[
            F.aggregate(
                F.zip_with(vec, idx, term(j)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for j in range(out_dim)
        ]
    )


def dimension_stats(
    df: DataFrame, *, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (dim, n, mean, variance, min, max) across the corpus.

    posexplode + groupBy(dim): Spark's partial aggregation reduces each
    partition to dim rows before the shuffle, so the exchange carries
    partitions × dim rows regardless of corpus size. Variance is the
    population form E[x²] − E[x]² computed from exact sums.
    """
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    return (
        exploded.groupBy("dim")
        .agg(
            F.count("x").alias("n"),
            F.sum("x").alias("_s"),
            F.sum(F.col("x") * F.col("x")).alias("_s2"),
            F.min("x").alias("mn"),
            F.max("x").alias("mx"),
        )
        .select(
            "dim",
            "n",
            (F.col("_s") / F.col("n")).alias("mean"),
            (
                F.col("_s2") / F.col("n")
                - (F.col("_s") / F.col("n")) * (F.col("_s") / F.col("n"))
            ).alias("variance"),
            "mn",
            "mx",
        )
    )
