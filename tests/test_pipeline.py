"""Differential + invariant tests for the LLM-data-pipeline operators."""

import pyspark.sql.functions as F
import pytest

from verax_spark.catalog import Catalog
from verax_spark.queries import pipeline
from verax_spark.testing import run_differential

ORACLED = sorted(pipeline.ORACLE)
ROWS_ONLY = sorted(set(pipeline.QUERIES) - set(pipeline.ORACLE))


@pytest.mark.parametrize("name", ORACLED)
def test_pipeline_matches_oracle(spark, sf_dir, name):
    rows = run_differential(
        spark, sf_dir, name, pipeline.QUERIES[name], pipeline.ORACLE[name]
    )
    assert rows > 0, f"{name}: empty result"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_pipeline_rows_only(spark, sf_dir, name):
    df = pipeline.QUERIES[name](spark, sf_dir)
    assert df.count() > 0, f"{name}: empty result"


def test_minhash_finds_the_high_jaccard_pairs(spark, sf_dir):
    """LSH recall check: every exact-Jaccard pair ≥ 0.5 must be found by the
    MinHash+LSH pipeline (32 bands × 2 rows ⇒ detection prob ≈ 1 at j≥0.5)."""
    from verax_spark.operators import dedup

    cat = Catalog(spark, sf_dir)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(
            cat.documents, "text", "doc_id", threshold=0.5, block_col="lang"
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            cat.documents, "text", "doc_id", num_perm=64, bands=32, threshold=0.5
        ).collect()
    }
    missed = exact - lsh
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_dedup_by_pairs_drops_losers(spark, sf_dir):
    from verax_spark.operators import dedup

    cat = Catalog(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(
        cat.documents, "text", "doc_id", threshold=0.3, block_col="lang"
    )
    kept = dedup.dedup_by_pairs(cat.documents, "doc_id", pairs)
    n_pairs = pairs.select("id_b").distinct().count()
    assert kept.count() == cat.documents.count() - n_pairs


def test_lsh_topk_recall_vs_brute(spark, sf_dir):
    """Approximate ANN should recover a decent fraction of true top-3."""
    from verax_spark.operators import similarity

    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    q = emb.filter(F.col("vec_id") < 5)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, q, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_topk(emb, q, k=3).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.4, f"LSH recall too low: {recall}"
