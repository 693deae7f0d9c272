"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``mongodb_etl_migration_spark.queries``;
this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the denormalized
    latest-order-per-customer view (SURVEY.md J5+J6 shape)."""
    from mongodb_etl_migration_spark.queries import flagship

    return flagship(spark, "/root/testdata/sf0.001")


# Enumeration order for the driver's correctness run. The driver may
# cap the number of queries it checks per round, so queries with no
# green driver row yet enumerate FIRST: round 3's fixes are the four
# formerly array-typed outputs (now scalar-serialized), the crypto
# migration (first oracle), the upgraded uuid invariant queries, and
# the new PNG codec query; long-green queries go last.
_PRIORITY = [
    # never green before round 3 — fixed/added this round
    "s5_nested_serialization",
    "sim_l2_normalize",
    "sim_group_centroids",
    "sim_quantize_int8",
    "x_crypto_migration",
    "k1_uuid5",
    "k2_timeuuid",
    "m_image_decode_png",
    "sim_topk_lsh",
    "a12_approx_distinct",
    "a13_approx_percentile_sketch",
    "d7_dedup_representatives",
    "t_decontaminate",
    "sim_centroid_assign",
    "sim_kmeans",
    "t_corpus_mix",
    "j16_salted_join",
    "t_quality_cutoff",
    "d8_incremental_neardup",
    "t_shard_pack",
    "m_frame_sample",
    "sim_topk_int8",
    "a14_salted_count",
    "d9_best_representatives",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data extensions, never-driver-checked entries first."""
    from mongodb_etl_migration_spark.queries import QUERIES

    ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
    # new queries added since the priority list was drawn up come next
    # (they have no driver row yet either), then the long-green rest
    # (round-1 greens last — they've been green twice).
    checked = _ROUND1_GREEN | _ROUND2_GREEN
    for n, q in QUERIES.items():
        if n not in ordered and n not in checked:
            ordered[n] = q
    for n, q in QUERIES.items():
        if n not in ordered and n in _ROUND2_GREEN:
            ordered[n] = q
    for n, q in QUERIES.items():
        if n not in ordered:
            ordered[n] = q
    return ordered


_ROUND1_GREEN = {
    "s1_filtered_scan", "s3_point_in_scan", "s4_source_count",
    "p4_message_predicate", "p2_coalesce_projection",
    "f_string_normalize", "f_gender_room_type", "f_url_rewrite",
    "f_path_functions", "f_mime_and_defaults", "f_deleted_user_redaction",
    "f_json_extract", "k3_sequential_ids",
    "j1_fk_resolution", "j3_normalized_key_join", "j4_m2m_explode",
    "j5_top1_per_group", "j6_denormalized_view", "j7_pair_generation",
    "j9_hierarchy_resolution", "j10_orphan_check", "j11_semi_membership",
    "a2_group_count", "a3_max_resume", "a4_distinct",
    "a5_collect_per_group", "a7_first_wins_dedup", "o2_global_topk",
    "u1_subtract", "u2_union_side_outputs", "d1_exact_dedup",
    "d2_minhash_lsh_pairs", "d3_simhash", "d4_ngram_jaccard",
    "sim_topk_bruteforce", "sim_embedding_neardup",
    "t_text_stats", "t_curation_pipeline", "t_length_histogram",
    "t_lang_id", "t_fingerprint", "m_multimodal_decode",
}


# Green in CORRECTNESS_r02.json (driver round 2) and unchanged since.
_ROUND2_GREEN = {
    "a1_pricing_summary", "a6_conditional_agg", "p7_filter_then_project",
    "e_windowed_counts", "e_sessionization", "p6_role_filter",
    "p9_empty_normalize", "s6_extended_json_ingest", "j8_membership_merge",
    "j9b_file_resolution", "j12_relation_build", "j13_asof_join",
    "j14_interval_join", "a8_depth_groups", "a9_rollup_totals",
    "o1_sort_by_derived_key", "o3_limit_sample", "d6_dedup_clusters",
    "t_deterministic_sample", "t_stratified_sample", "t_top_bigrams",
    "t_train_test_split", "o6_moving_avg", "f_levenshtein",
    "v1_count_reconciliation", "a10_percentiles", "a11_pivot_counts",
    "d5_minhash_estimate", "m_image_decode_real", "m_audio_decode_real",
    "j15_scd2_versions", "e_session_window_builtin", "e_attribution_join",
    "j8b_upsert", "t_chunk_documents", "t_pii_scrub", "t_repetition",
    "t_tfidf_top_terms",
}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query. Omitted entries
    (uuid/timeuuid bit-layouts, ciphers, runtime-looked-up LSH planes)
    fall back to the driver's rows-only check."""
    from mongodb_etl_migration_spark.queries import ORACLES

    return dict(ORACLES)
