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
    # -- round 8: set MECHANICALLY from COVERAGE_AUDIT.json
    # summary.suggested_priority (tools/coverage_audit.py, VERDICT r7
    # item 2).  The audit now certifies INFRA-ONLY drift transitively:
    # a stale pair traced by >=25% of the registry (session confs,
    # load_table) is certified fresh when any green driver row from a
    # round at the pair's current AST traces the same pair — so the
    # r7 221-name overflow collapses to the function-specific residue
    # (cosine/ANN/kmeans family, rollup_reuse/rolling_median/
    # trend_slope/c4b, the sql_* subquery family) plus oldest-evidence
    # rotation.  Registry growth stays FROZEN. -------------------------
    "rollup_reuse_daily_monthly",
    "rolling_median",
    "trend_slope",
    "c4b_shuffle_hash_hint",
    "bucketed_join",
    "dpp_partition_pruned_join",
    "sql_correlated_subquery",
    "sql_exists_subquery",
    "sql_nested_agg_subquery",
    "sql_q6_revenue",
    "skew_salted_join",
    "events_tumbling",
    "j2_sliding_window",
    "j4_sessionization_metrics",
    "cohort_retention",
    "j3_session_window",
    "c8b_asof_forward",
    "event_debounce",
    "interval_overlap_join",
    "cosine_topk",
    "embedding_neardup",
    "i6b_cosine_topk_hof",
    "i7_knn",
    "i8_centroid_classify",
    "ivf_ann",
    "ivf_recall",
    "kmeans_lloyd",
    "ann_lsh",
    "ann_multiprobe",
    "ann_multiprobe_recall",
    "ann_recall",
    "hybrid_rrf_search",
    "i8b_centroid_accuracy",
    "a10_orc_roundtrip",
    "a12_zstd_parquet",
    "a13_compact_small_files",
    "a14_clustered_layout",
    "sql_group_by_all",
    "sql_lateral_topk",
    "sql_recursive_cte",
    "a11_text_roundtrip",
    "a15_file_lineage",
    "a16_fixed_width",
    "a9_python_datasource",
    "h7_variant",
    "h8_xml_extract",
    "k5_arrow_udf",
    "k6_map_in_arrow",
    "k7_cogroup_asof",
    "k8_grouped_agg_udaf",
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
