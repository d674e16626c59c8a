"""Query registry assembly — importing the modules registers everything."""

from . import (  # noqa: F401
    analytics,
    aggs,
    events,
    indicators_q,
    joins,
    llm,
    scalars,
    setops,
    streaming_q,
    tpch,
    tpch2,
    tpch3,
    udf_io,
    windows,
)
from .base import REGISTRY, QuerySpec

# The correctness driver samples the FIRST 50 registry entries (in dict
# iteration order) for its oracle gate. Round 1 greened the first 50
# (aggs/events/joins/doc basics — see CORRECTNESS_r01.json); round 2
# rotates the window so every remaining SURVEY §2.B family gets a
# driver-green row: window functions, TPC-H shapes, scalar families,
# set ops, UDF/IO surface, streaming, and the advanced LLM-pipeline ops
# (MinHash/SimHash/IVF/PII/multimodal), plus the two queries whose
# oracles were re-typed this round (HUGEINT -> BIGINT casts).
#
# ROUND-3 ROTATION PLAN: put the remaining never-driver-checked queries
# first — as of end of round 2 that set is (29): agg_percentiles_approx,
# trade_pipeline_schema_evolution, emb_label_stats, emb_cosine_near_dup,
# emb_cosine_near_dup_ivf, audio_wav_features, fn_distinct_limit,
# fn_array_suite2, fn_json_from_json, fn_hash_spark_native,
# fn_json_tuple, fn_posexplode, fn_string_suite2, set_intersect,
# set_except, q5, q6, q10, q4, q11, q13, q17, q22, events_funnel, q7,
# q9, q14, q16, io_parquet_roundtrip — then backfill the window with any
# query that failed in CORRECTNESS_r02.
_WINDOW_PRIORITY = [
    # re-typed oracles (hash-failed in r01, value-level correct)
    "cumulative_distinct_users",
    "sessionize_gap",
    # window functions (one per §2.B row)
    "win_rank_suite",
    "win_ntile_pct",
    "win_lag_lead",
    "win_running_sum",
    "win_moving_avg",
    "win_range_frame",
    "win_first_last_value",
    "win_topk_per_group",
    "win_cumulative_ewma",
    # TPC-H shapes (agg, global top-k, 6-way broadcast join, HAVING
    # subquery, disjunctive pushdown, market share)
    "q1_pricing_summary",
    "q3_revenue_topk",
    "q8_market_share",
    "q18_large_orders",
    "q19_disjunctive_pushdown",
    # scalar families (one per §2.B family row)
    "fn_string_suite",
    "fn_datetime_suite",
    "fn_math_suite",
    "fn_array_suite",
    "fn_map_ops",
    "fn_struct_ops",
    "fn_json_suite",
    "fn_hash_suite",
    "fn_filter_predicates",
    "fn_conditional",
    # set operations
    "set_union_all",
    "set_union_distinct",
    "set_intersect_all",
    "set_except_all",
    # UDF/UDAF/UDTF surface
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udf_pandas_grouped_agg",
    "udf_grouped_map_zscore",
    "udf_map_in_pandas",
    "udtf_tokenize",
    # non-parquet IO round-trips
    "io_csv_roundtrip",
    "io_json_roundtrip",
    "io_jdbc_roundtrip",
    # streaming (batch-equivalence checked)
    "stream_ewma_5min",
    "stream_dedup_count",
    "rollup_maintained",
    # advanced LLM-pipeline ops
    "minhash_near_dup",
    "simhash_near_dup",
    "ann_ivf_topk",
    "doc_lang_id_heuristic",
    "multimodal_features",
    "near_dup_clusters",
    "doc_pii_scan",
    # right-outer join (new this round — closes the §2.B sub-gap)
    "join_right_outer",
]


def _reorder_registry() -> None:
    missing = [n for n in _WINDOW_PRIORITY if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"window-priority queries not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in _WINDOW_PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["REGISTRY", "QuerySpec"]
