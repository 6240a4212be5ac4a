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
    # item 2).  Ordering: queries whose EXECUTED code (profiler-traced
    # at plan construction + one-hop referenced executor kernels)
    # changed most recently first — the round-7 edits (cents_grid/q1,
    # PQ geometry, materialize sites) and the round-6 dedup/ANN/graph
    # rewrites — then the oldest-evidence cohort.  119 queries are
    # stale under the strict no-row-predates-code rule; the 69 that
    # don't fit this 50-slot window are in
    # summary.stale_overflow_next_round and rotate in round 8.
    # Registry growth stays FROZEN. ----------------------------------
    "i4c_ngram_jaccard",
    "i4_jaccard_pairs",
    "i4b_minhash_lsh",
    "kcore_peel",
    "lsh_bucket_stats",
    "minhash_est_quality",
    "mmr_diversified_topk",
    "neardup_clusters",
    "neardup_degree_hist",
    "neardup_triangles",
    "pagerank_neardup",
    "containment_pairs",
    "neardup_link_predict",
    "pq_ann",
    "pq_recall",
    "q1_pricing_summary",
    "i8_centroid_classify",
    "i6c_quantized_rerank",
    "d8_percentiles",
    "distinct_agg",
    "f1_multi_sort",
    "g3b_dedup_subset_keepmin",
    "stats_corr",
    "pretrain_corpus",
    "a15_file_lineage",
    "a16_fixed_width",
    "embedding_clip_stats",
    "event_debounce",
    "h1c_regexp_extract_all",
    "j11_stream_update_counts",
    "j5_stream_watermark",
    "mm_decode_audio",
    "mm_resize",
    "pareto_abc",
    "profile_table",
    "trend_slope",
    "h2b_datetime_funcs_more",
    "j7_stateful_totals",
    "c10_null_aware_anti",
    "c4b_shuffle_hash_hint",
    "chunk_overlap",
    "e1c_ntile",
    "rollup_reuse_daily_monthly",
    "a1_parquet_scan",
    "a5_nanos_ingest",
    "b1_project_derive",
    "b2_filter_predicates",
    "b3_case_when",
    "b4_null_handling",
    "b5_casts",
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
