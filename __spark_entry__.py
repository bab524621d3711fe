"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from verax_spark.queries import tpch

    return tpch.q1(spark, "/root/testdata/sf0.001")


# The driver evaluates queries in dict order and (empirically) stops after 50
# entries.  Order matters.  Round-8 rotation per the round-7 judge (#4):
# the 7 queries whose latest green driver row is still r03
# (tpch_q2/q6/q9/q15/q18/q20/q21 — just outside the r07 window) go at
# positions 1-7, then queries whose implementation changed this round
# (must re-verify), then everything else oldest-green first (r04 block,
# then r05, then r07). The first 50 of the r07 ordering all greened in
# CORRECTNESS_r07 and rotate to the back.
_PRIORITY = [
    # -- r10 session-5 changes (optimization round, changed-first):
    # q2 build-side flip, DML schema pinning (every DML/storage demo),
    # CC gate-probe restructure (cc/curate), cached expression trees
    # (batch7/batch8/classification). Duplicates later in the list are
    # harmless — first occurrence wins in _ordered().
    "tpch_q2",
    "sql_delete",
    "sql_update",
    "sql_insert",
    "sql_txn",
    "sql_ctas",
    "sql_time_travel",
    "sql_mview",
    "op_table_delete",
    "op_table_update",
    "op_fn_batch7",
    "op_fn_batch8",
    "op_fn_classification",
    "pl_dedup_cc",
    "pl_curate",
    # -- r10 rotation (VERDICT r09 #4: changed-first, stalest-green
    # next). Positions 1-12 of the mid-build rotation: queries whose
    # implementation or oracle changed in r10 (projection-derived
    # q1/q6/q14, two-level hot-bucket dedup, curate lineage cut, bing
    # let-binding in batch12, lookup-join IN fix, scale-independent
    # explain options). Then the 29 queries whose latest green is r05,
    # then the oldest r07 block. Everything else rotates behind,
    # previous order preserved.
    "op_fn_batch15",
    "op_fn_geo5",
    "op_fn_batch14",
    "op_fn_geo4",
    "op_fn_batch13",
    "sql_explain_options",
    "tpch_q1",
    "tpch_q6",
    "tpch_q14",
    "pl_dedup_minhash",
    "pl_dedup_simhash",
    "pl_dedup_cc",
    "pl_curate",
    "op_fn_batch12",
    "op_join_lookup",
    "op_builder_reorder",
    "sql_join_reorder",
    "op_join_semi",
    "op_sessionize",
    "op_setop_intersect",
    "op_setop_union_all",
    "op_special_forms",
    "op_subquery_scalar",
    "op_table_delete",
    "op_table_update",
    "op_unnest_structs",
    "op_values",
    "op_window_groups_frame",
    "pl_chunk_documents",
    "pl_decontaminate",
    "pl_embed_ops",
    "pl_embed_stats",
    "pl_multimodal_audio",
    "pl_multimodal_image",
    "pl_multimodal_video",
    "pl_sample_stratified",
    "pl_text_pii_scrub",
    "pl_text_repetition",
    "sql_function",
    "sql_mview",
    "sql_natural_join",
    "sql_quantified",
    "sql_schema",
    "sql_statement_tail",
    "sql_time_travel",
    "st_session_windows",
    "tpch_q3",
    "op_agg_ordered",
    "op_cube",
    "op_fn_classification",
    "op_fn_setdigest",
    "op_join_cross",
    "op_join_full",
    # -- r08/r09-validated tail, previous rotation order --
    "op_fn_geo3",
    "op_fn_geo2",
    "op_fn_geo",
    "op_fn_batch7",
    "op_fn_batch9",
    "op_fn_batch10",
    "op_fn_extra",
    "pl_lm_score",
    "pl_resample_mixture",
    "pl_text_langid",
    "pl_text_quality",
    "pl_text_regex_tokens",
    "pl_text_stats",
    "pl_time_rollup",
    "sql_ansi_forms",
    "sql_ctas",
    "sql_delete",
    "sql_describe",
    "sql_insert",
    "sql_ordered_agg",
    "sql_txn",
    "sql_unnest_map_kv",
    "sql_unnest_ordinality",
    "sql_update",
    "st_dedup",
    "st_enrich_join",
    "st_stream_join",
    "op_agg_distinct",
    "op_connector_formats",
    "op_distinct",
    "op_fn_agg2",
    "op_fn_batch6",
    "op_fn_batch8",
    "op_fn_collections",
    "op_fn_datetime",
    "op_fn_hll",
    "op_fn_json",
    "op_fn_math",
    "op_fn_sketch_merge",
    "op_fn_string",
    "op_hof_transform_filter",
    "op_join_anti",
    "op_join_mark",
    "op_limit_offset",
    "op_rollup",
    "op_setop_union",
    "op_subquery_in",
    "op_unnest_empty_drop",
    "op_unnest_multi",
    "op_unnest_ordinality",
    "op_window_lead_lag",
    "op_window_rows_frame",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q19",
    "tpch_q4",
    "tpch_q5",
    "tpch_q7",
    "op_subfield_pushdown",
    "pl_asof_join",
    "pl_asof_join_salted",
    "pl_dedup_embedding",
    "pl_dedup_exact",
    "pl_knn_brute",
    "pl_pack_sequences",
    "pl_token_vocab",
    "sql_lateral",
    "sql_subscript",
    "sql_try",
    "sql_window_clause",
    "st_windowed_counts",
    "tpch_q2",
    "tpch_q9",
    "tpch_q15",
    "tpch_q18",
    "tpch_q20",
    "tpch_q21",
    "tpch_q13",
    "tpch_q16",
    "tpch_q17",
    "tpch_q22",
    "tpch_q8",
    "op_agg_filter",
    "op_connector_tpch",
    "op_dereference",
    "op_fn_array_map",
    "op_fn_conv",
    "op_fn_decimal",
    "op_fn_map_agg",
    "op_fn_null_semantics",
    "op_fn_percentile",
    "op_grouping_sets",
    "op_hof_aggregate",
    "op_hof_zip_with",
    "op_join_theta",
    "op_setop_except",
    "op_sort_nulls",
    "op_table_write",
    "op_unnest_array",
    "op_unnest_map",
    "op_window_ntile",
    "op_window_range_frame",
    "op_window_rank",
    "pl_dedup_ngram_jaccard",
    "pl_knn_ivf",
    "pl_knn_lsh",
    "pl_multimodal_decode",
    "pl_multimodal_frames",
    "pl_multimodal_resize",
    "pl_range_join",
    "pl_text_fingerprint",
]


def _ordered(out: dict) -> dict:
    ordered = {n: out[n] for n in _PRIORITY if n in out}
    ordered.update({n: f for n, f in out.items() if n not in ordered})
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    from verax_spark.queries import tpch

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(tpch.QUERIES)
    try:
        from verax_spark.queries import operators

        out.update(operators.QUERIES)
    except ImportError:
        pass
    try:
        from verax_spark.queries import pipeline

        out.update(pipeline.QUERIES)
    except ImportError:
        pass
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() key."""
    from verax_spark.queries import tpch

    out: dict[str, str] = {}
    out.update(tpch.ORACLE)
    try:
        from verax_spark.queries import operators

        out.update(operators.ORACLE)
    except ImportError:
        pass
    try:
        from verax_spark.queries import pipeline

        out.update(pipeline.ORACLE)
    except ImportError:
        pass
    return _ordered(out)
