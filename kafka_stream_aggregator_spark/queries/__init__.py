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
    tpch4,
    udf_io,
    windows,
)
from .base import REGISTRY, QuerySpec

# The correctness driver samples the FIRST 50 registry entries (in dict
# iteration order) for its oracle gate. Round 1 greened the first 50
# (aggs/events/joins/doc basics — CORRECTNESS_r01.json); round 2 greened
# the next 50 (windows, TPC-H shapes, scalar families, set ops, UDF/IO,
# streaming, LLM ops — CORRECTNESS_r02.json, 49 green + fn_math_suite
# type-level hash artifact fixed this round via oracle casts).
#
# ROUND-3 WINDOW: the 31 queries that have never had a driver verdict go
# first — after this round every registered query has a CORRECTNESS row
# across r1-r3. Then fn_math_suite (re-verify the oracle-cast fix), the
# two queries upgraded this round from rows-only to full oracles
# (deterministic IVF / stopword-vote SQL twins), and the queries added
# in round 3.
_WINDOW_PRIORITY = [
    # --- never driver-checked before round 3 (31) ---
    "agg_percentiles_approx",       # declared 100 TB percentile tier
    "trade_pipeline_schema_evolution",
    "doc_token_heavy_hitters",
    "emb_label_stats",
    "emb_cosine_near_dup",
    "emb_cosine_near_dup_ivf",      # scale path of a graded LLM op
    "audio_wav_features",
    "fn_distinct_limit",
    "fn_array_suite2",
    "fn_json_from_json",
    "fn_hash_spark_native",
    "fn_json_tuple",
    "fn_posexplode",
    "fn_string_suite2",
    "set_intersect",
    "set_except",
    "stream_dedup_within_wm_count",
    "q5_regional_revenue",          # bench headliner
    "q6_forecast_revenue",
    "q10_returned_items",           # bench headliner
    "q4_order_priority",
    "q11_important_stock",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q22_global_acctbal",
    "events_funnel",
    "q7_volume_shipping",
    "q9_profit_by_nation",
    "q14_promo_revenue",
    "q16_parts_supplier_count",
    "io_parquet_roundtrip",
    # --- re-verify the round-3 oracle type-cast fix ---
    "fn_math_suite",
    # --- upgraded rows-only -> full oracle in round 3 ---
    "ann_ivf_topk",
    "doc_lang_id_heuristic",
    # --- new in round 3 (appended as they land) ---
    "q2_min_cost_supplier",
    "q12_priority_linecount",
    "q15_top_supplier",
    "q20_heavy_suppliers",
    "q21_suppliers_kept_waiting",
    "set_except_all",               # re-verify the round-3 fused plan
    "set_except_all_raw",
    "agg_percentiles",              # re-verify the round-3 builtin tier
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
