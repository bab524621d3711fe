"""End-to-end training-data curation pipeline.

The composition a 100 TB corpus run would execute, built entirely from this
package's operators — one declarative DataFrame DAG per stage so Catalyst
sees the whole plan:

  raw documents
    → exact dedup                 (hash shuffle on content hash)
    → near-dup dedup              (MinHash+LSH candidates → exact-Jaccard
                                   verify → connected components → keep min)
    → quality + language gate     (map-only Column expressions)
    → per-doc feature annotation  (token counts, fingerprint)

Every stage is linear or LSH-bounded; nothing is quadratic in the corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verax_spark.operators import dedup, text


def curate(
    documents: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    min_quality: float = 0.4,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Curated corpus: deduped (exact + transitive near-dup), quality- and
    language-gated, annotated with token stats and a content fingerprint."""
    # step1 feeds three downstream JOBS (the LSH band-entries checkpoint,
    # the candidate-shingle checkpoint, and the connected-components edge
    # checkpoint) plus the final projection — each would re-run the
    # documents scan and the exact-dedup shuffle from scratch. Cut the
    # lineage once: measured 6.6s -> 5.3s steady at sf0.1 (r10 A/B; the
    # r08 measurement that favored lazy predates the checkpointed LSH
    # internals), and at 100 TB it is the difference between one and four
    # executions of the full dedup shuffle.
    step1 = dedup.exact_dedup(documents, text_col, id_col).localCheckpoint(
        eager=True
    )
    pairs = dedup.minhash_lsh_pairs(
        step1, text_col, id_col, num_perm=64, bands=32, threshold=jaccard_threshold
    )
    step2 = dedup.dedup_transitive(step1, id_col, pairs)
    t = F.col(text_col)
    # quality is computed ONCE and reused by the gate (filter + project of
    # the same expression would evaluate it twice at runtime — Spark has
    # no cross-operator CSE)
    annotated = step2.select(
        "*",
        text.token_count(t).alias("n_tokens"),
        text.est_bpe_tokens(t).alias("bpe_est"),
        text.quality_score(t).alias("quality"),
        text.fingerprint(t).alias("fingerprint"),
    )
    gated = annotated.filter(F.col("quality") >= min_quality)
    if langs is not None:
        gated = gated.filter(text.lang_id(t).isin(*langs))
    return gated


def curation_report(documents: DataFrame, curated: DataFrame) -> DataFrame:
    """One-row summary: docs in/out, token totals — the numbers a pipeline
    operator tracks per snapshot."""
    from verax_spark.optimizer.query_graph import _parquet_row_count

    n_in = _parquet_row_count(documents)  # footer metadata when possible
    if n_in is None:
        n_in = documents.count()
    stats = curated.agg(
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("quality").alias("avg_quality"),
    )
    return stats.select(
        F.lit(n_in).alias("docs_in"),
        "docs_out",
        (F.lit(n_in) - F.col("docs_out")).alias("docs_removed"),
        "total_tokens",
        F.round("avg_quality", 4).alias("avg_quality"),
    )
