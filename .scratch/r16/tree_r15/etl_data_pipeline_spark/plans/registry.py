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
    # round 11: SURVEY §2.2 growth rules — new-capability operators
    # live in a NEW module so no existing query's recorded trace pair
    # (module prelude) is dirtied by their arrival.
    "etl_data_pipeline_spark.plans.scale_patterns",
    # round 12: two-level (hierarchical) IVF — same §2.2 rationale,
    # same new-module isolation.
    "etl_data_pipeline_spark.plans.ann_hier",
    # round 15: incremental near-dup against a persisted LSH index
    # (VERDICT r14 item 5) — same new-module isolation.
    "etl_data_pipeline_spark.plans.incremental",
]

#: Explicit front-of-window ordering for the driver's correctness run
#: (~50 entries checked in registration order). Names not listed keep
#: registration order after these. Unknown names are ignored
#: (defensive: a renamed query must not break loading).
_PRIORITY = [
    # -- round 15 close (optimization round): set MECHANICALLY from
    # COVERAGE_AUDIT.json summary.suggested_priority after the final
    # trace refresh.  Head: incremental_neardup (still never
    # driver-checked), then the 43-name touched cohort — the two
    # optimization batches + the continuation session's
    # connected-components loop restructure dirty every query tracing
    # similarity.py / text.py / timeseries.py / etl.py / graph.py
    # executed code, and touched-since-check outranks staleness —
    # then 6 of the oldest-evidence r8 tier (events_tumbling, h7, h8,
    # interval_overlap_join, j2, j3).  The 12 r8-evidence names that
    # no longer fit (j4, k5, k6, k8, skew_salted_join, the sql_*
    # block) defer to r16's rotation: a 50-slot window cannot hold a
    # 43-name touch-set and a 22-name staleness drain at once
    # (disclosed in OPTIMIZATION_r15.md).
    "incremental_neardup",
    "cusum_changepoint",
    "i6c_quantized_rerank",
    "hybrid_rrf_search",
    "i6b_cosine_topk_hof",
    "pq_ann",
    "pq_recall",
    "k7_cogroup_asof",
    "dq_audit",
    "profile_table",
    "neardup_clusters",
    "ivf2_ann",
    "ivf2_recall",
    "ivf_ann",
    "ivf_recall",
    "i4b_minhash_lsh",
    "kcore_peel",
    "minhash_est_quality",
    "neardup_degree_hist",
    "neardup_link_predict",
    "neardup_triangles",
    "pagerank_neardup",
    "ann_lsh",
    "ann_multiprobe",
    "ann_multiprobe_recall",
    "ann_recall",
    "rolling_median",
    "rollup_reuse_daily_monthly",
    "trend_slope",
    "ewma_smooth",
    "anomaly_p95",
    "daily_active_cumulative",
    "e5_running_distinct",
    "funnel_conversion",
    "gap_fill_locf",
    "robust_zscore_mad",
    "resample_ohlc",
    "cosine_topk",
    "embedding_neardup",
    "i7_knn",
    "i8_centroid_classify",
    "i8b_centroid_accuracy",
    "kmeans_lloyd",
    "mmr_diversified_topk",
    "events_tumbling",
    "h7_variant",
    "h8_xml_extract",
    "interval_overlap_join",
    "j2_sliding_window",
    "j3_session_window",
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
