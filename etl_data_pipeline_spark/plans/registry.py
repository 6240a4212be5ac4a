"""Registry mapping query name -> (Spark callable, DuckDB oracle SQL).

Keeping both halves of the contract in one decorator call is what keeps
the Spark result and the oracle result column-name aligned (the driver
sorts columns by name before hashing, so every computed column must be
aliased identically on both sides).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: Modules that define queries; imported lazily by load_all_plans so that
#: importing the package stays cheap.
#:
#: ORDER MATTERS for external evidence: the driver's correctness run
#: checks the first ~50 queries in registration order, so families whose
#: queries have never had a driver-side correctness row register first,
#: and the round-1-proven families (relational, etl) rotate to the back.
#: Round-1 window covered: all of relational + the first 13 etl queries.
#: Round-2 front-load (this order): vectors(10) text(11) events(6)
#: scalar(10) udfs(4) io(6) = 47, then streaming j5/j6/j7 complete the
#: window at 50. Still never driver-checked after round 2 — rotate these
#: to the front next round: streaming j8, multimodal(3), pipelines(2),
#: sql_api(7), relational c2_right_join, the etl tail (8), and the
#: round-2 curation module (5).
_PLAN_MODULES = [
    "etl_data_pipeline_spark.plans.vectors",
    "etl_data_pipeline_spark.plans.text",
    "etl_data_pipeline_spark.plans.events",
    "etl_data_pipeline_spark.plans.scalar",
    "etl_data_pipeline_spark.plans.udfs",
    "etl_data_pipeline_spark.plans.io",
    "etl_data_pipeline_spark.plans.streaming",
    "etl_data_pipeline_spark.plans.multimodal",
    "etl_data_pipeline_spark.plans.pipelines",
    "etl_data_pipeline_spark.plans.sql_api",
    "etl_data_pipeline_spark.plans.relational",
    "etl_data_pipeline_spark.plans.etl",
    "etl_data_pipeline_spark.plans.curation",
    "etl_data_pipeline_spark.plans.timeseries",
    "etl_data_pipeline_spark.plans.modern",
    "etl_data_pipeline_spark.plans.sketches",
]

#: Explicit front-of-window ordering for the driver's correctness run
#: (~50 entries checked in registration order). Round-5 rotation:
#: `dedup_survivorship` leads (the only registered query with no
#: cumulative CORRECTNESS row — committed after the r04 run), followed
#: by everything whose code or oracle CHANGED in round 5 (LSH bucket
#: cap and its three consumers, de-hinted vocab joins, byte-based
#: multimodal oracles, integer df-cap, bloom-join cache, the three
#: rows-only -> exact error-bound reformulations) and the brand-new
#: round-5 queries. Names not listed keep registration order after
#: these. Unknown names are ignored (defensive: a renamed query must
#: not break loading).
_PRIORITY = [
    # -- never driver-checked (added post-r04-run) ----------------------
    "dedup_survivorship",
    # -- changed in round 5 (need fresh evidence) -----------------------
    # LSH band-bucket cap (operators/text.py) + mirrored oracle CTE
    "i4b_minhash_lsh",
    "neardup_clusters",
    "pagerank_neardup",
    # de-hinted vocab joins (scale posture; same results)
    "pmi_bigrams",
    "source_kl_divergence",
    # integer df-cap compare (float-boundary guard)
    "i4_jaccard_pairs",
    # byte-semantics oracles (non-ASCII-safe parity)
    "mm_features",
    "mm_decode_image",
    "mm_decode_video",
    "mm_frame_sample",
    # single-execution cache fix
    "runtime_bloom_join",
    # rows-only -> exact error-bound oracles (ann_recall template)
    "d4_approx_distinct",
    "d8b_percentile_approx",
    "kmeans_lloyd",
    # -- new in round 5 -------------------------------------------------
    "lsh_bucket_stats",
    "tpch_q4_exists",
    "tpch_q14_promo_share",
    "tpch_q19_disjunctive",
    "neardup_degree_hist",
    "j12_stream_sliding",
    "neardup_triangles",
    "mmr_diversified_topk",
    "kcore_peel",
    "pps_systematic_sample",
    "tpch_q13_custdist",
    "tpch_q17_small_qty",
    "tpch_q18_large_orders",
    "tpch_q2_min_cost",
    "tpch_q21_waiting",
    "tpch_q22_idle_customers",
    "tpch_q7_volume",
    "ewma_smooth",
    "tpch_q11_important_stock",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "minhash_est_quality",
    "a17_zorder_layout",
    "weighted_sample_topk",
    "rfm_segmentation",
    "dq_fk_orphans",
    "ivf_recall",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "tpch_q10_returned_topk",
    "tpch_q12_priority_lines",
    "tpch_q20_excess_share",
    # perf rewrites from the sf0.1 registry sweep / two-scale slope
    # check (c9/ivf results unchanged; fuzzy regrained to distinct
    # names).  _PRIORITY now holds exactly 50 names — the full driver
    # window, matching the 50 that held in r04.
    "c9_nullsafe_join",
    "ivf_ann",
    "fuzzy_levenshtein",
]

#: Round-6 rotation carry-over: the 45 round-5 batch-5..15 queries were
#: committed AFTER this round's window was pinned, so they register
#: behind it and have no driver CORRECTNESS row yet — front them next
#: round: heavy_hitters_mg, bloom_membership, bigram_lm_score,
#: event_transition_matrix, skyline_price_size, benford_digit_audit,
#: cusum_changepoint, sql_pipe_syntax, sql_parameterized,
#: c8c_asof_nearest, interval_coverage, session_path_trigrams,
#: weighted_median, e1d_cume_dist_nth, j13_stream_static_enrich,
#: mm_audio_energy, neardup_link_predict, robust_zscore_mad,
#: containment_pairs, table_diff, d5d_grouping_id, data_skew_report,
#: pq_ann, pq_recall, token_entropy, k9_grouped_apply_in_arrow,
#: sql_variables, sql_execute_immediate, j3b_dynamic_gap_session,
#: sql_scripting, mm_image_histogram, b5c_try_arithmetic, h9_collation,
#: dq_expectations, funnel_latency, sales_mart, ivm_incremental_agg,
#: scd2_point_in_time_join, f2b_topk_with_ties, ann_multiprobe,
#: ann_multiprobe_recall, lang_id_confusion, i8b_centroid_accuracy,
#: bm25_topk, hybrid_rrf_search.
#: (All 45 are green in the in-repo driver emulator at sf0.01 — see
#: the per-batch emulator runs in the round-5 commit history.)

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and, when SQL-expressible, its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_plans() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    # Rebuild insertion order so _PRIORITY names come first — the
    # driver's correctness window follows dict order.
    front = [n for n in _PRIORITY if n in QUERIES]
    front_set = set(front)
    rest = [n for n in QUERIES if n not in front_set]
    for d in (QUERIES, ORACLES):
        ordered = {n: d[n] for n in front + rest if n in d}
        d.clear()
        d.update(ordered)
    _loaded = True
