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
#: checks the first ~50 queries in registration order.  _PRIORITY
#: (below) pins the front of that window each round — never-checked
#: queries first, then re-checks of anything whose code or oracle
#: changed; tools/coverage_audit.py reports the cumulative per-query
#: driver-check state that drives the rotation.
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
#: (~50 entries checked in registration order). Names not listed keep
#: registration order after these. Unknown names are ignored
#: (defensive: a renamed query must not break loading).
_PRIORITY = [
    # -- round 7: set MECHANICALLY from COVERAGE_AUDIT.json
    # summary.suggested_priority (tools/coverage_audit.py, VERDICT r6
    # item 2).  The audit now measures SEMANTIC staleness (normalized
    # AST, docstrings/comments stripped, module preludes hashed
    # separately) and ranks by change SPECIFICITY: queries whose own
    # operators/kernels were rewritten (the r6 perf campaign + r7
    # materialize()/cents_grid/PQ-geometry edits) lead; queries whose
    # only invalidation is infra drift traced by all 271 (session
    # confs) rotate behind them.  Overflow is in
    # summary.stale_overflow_next_round for round 8.  Registry growth
    # stays FROZEN. ---------------------------------------------------
    "i4c_ngram_jaccard",
    "q3_topk_join",
    "q5_multi_join",
    "kcore_peel",
    "minhash_est_quality",
    "mmr_diversified_topk",
    "neardup_clusters",
    "neardup_triangles",
    "pagerank_neardup",
    "containment_pairs",
    "neardup_link_predict",
    "distinct_agg",
    "c8_asof_join",
    "i4_jaccard_pairs",
    "pq_ann",
    "pq_recall",
    "q1_pricing_summary",
    "scd2_point_in_time_join",
    "corpus_curation",
    "hash_split",
    "pretrain_corpus",
    "i6c_quantized_rerank",
    "mm_decode_audio",
    "mm_resize",
    "i4b_minhash_lsh",
    "neardup_degree_hist",
    "j7_stateful_totals",
    "j10_stream_session_windows",
    "j11_stream_update_counts",
    "j5_stream_watermark",
    "j6_stream_dedup",
    "j8_foreach_batch_sink",
    "j9_stream_stream_join",
    "lsh_bucket_stats",
    "h1_string_funcs",
    "h1b_string_funcs_more",
    "h2_datetime_funcs",
    "h2b_datetime_funcs_more",
    "h3_math_funcs",
    "h4_array_funcs",
    "h6_json_extract",
    "h6b_from_json",
    "h5_map_funcs",
    "h1c_regexp_extract_all",
    "anomaly_p95",
    "daily_active_cumulative",
    "e5_running_distinct",
    "funnel_conversion",
    "gap_fill_locf",
    "resample_ohlc",
]

#: Round-7 status: cumulative driver coverage is 271/271 (r06 drained
#: the never-checked backlog).  The window is now a pure staleness
#: rotation, prescribed by ``python tools/coverage_audit.py --check``
#: which fails when this list omits anything the audit says belongs in
#: the window — update this list FROM summary.suggested_priority, do
#: not hand-curate it.

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
