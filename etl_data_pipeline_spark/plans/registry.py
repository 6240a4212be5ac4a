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
]

#: Explicit front-of-window ordering for the driver's correctness run
#: (~50 entries checked in registration order). Names not listed keep
#: registration order after these. Unknown names are ignored
#: (defensive: a renamed query must not break loading).
_PRIORITY = [
    # -- round 12 (second session): set MECHANICALLY from
    # COVERAGE_AUDIT.json summary.suggested_priority.  Head: the two
    # never-checked round-12 additions (two-level IVF, plans/
    # ann_hier.py), then the touched-since-check cohort (the adaptive
    # ANN family incl. the round's three PQ scale fixes, the shared
    # shingle helper, the lang_id hashed-model rewrite, a18), then the
    # oldest-evidence rotation covering the entire remaining
    # infra-certified-only cohort (VERDICT r11 item 3).
    "ivf2_ann",
    "ivf2_recall",
    "pq_ann",
    "pq_recall",
    "ann_lsh",
    "ann_multiprobe",
    "ann_multiprobe_recall",
    "ann_recall",
    "ivf_ann",
    "ivf_recall",
    "decontaminate",
    "a18_parquet_stats",
    "lang_id",
    "lang_id_confusion",
    "decontaminate_bloom",
    "tpch_q8_market_share",
    "tpch_q9_profit",
    "bloom_membership",
    "c8c_asof_nearest",
    "cusum_changepoint",
    "event_transition_matrix",
    "funnel_latency",
    "h9_collation",
    "heavy_hitters_mg",
    "interval_coverage",
    "ivm_incremental_agg",
    "j13_stream_static_enrich",
    "j3b_dynamic_gap_session",
    "k9_grouped_apply_in_arrow",
    "mm_audio_energy",
    "mm_image_histogram",
    "robust_zscore_mad",
    "sales_mart",
    "session_path_trigrams",
    "sql_execute_immediate",
    "sql_parameterized",
    "sql_pipe_syntax",
    "sql_scripting",
    "sql_variables",
    "anomaly_p95",
    "c8_asof_join",
    "containment_pairs",
    "corpus_curation",
    "daily_active_cumulative",
    "distinct_agg",
    "e5_running_distinct",
    "funnel_conversion",
    "gap_fill_locf",
    "h1_string_funcs",
    "h1b_string_funcs_more",
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
