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
]

#: Explicit front-of-window ordering for the driver's correctness run
#: (~50 entries checked in registration order). Round-3 rotation:
#: the three round-2 FAILURES first (fixed this round — j4 NTZ cast,
#: h5/h1c array-cell canonicalization), then every query that has never
#: had a driver-side correctness row in r01/r02 (north-star curation /
#: vector / text families first, then SQL surfaces, relational
#: gap-fills, UDF/io legs). Names not listed keep registration order
#: after these. Unknown names are ignored (defensive: a renamed query
#: must not break loading).
_PRIORITY = [
    # round-2 failures, fixed in round 3
    "j4_sessionization_metrics",
    "h5_map_funcs",
    "h1c_regexp_extract_all",
    "h4b_array_setops",  # same array-cell hazard, fixed preemptively
    # never driver-checked: north-star curation / dedup / vectors
    "i6c_quantized_rerank",
    "neardup_clusters",
    "mixture_sample",
    "pack_sequences",
    "pack_greedy",
    "redact_pii",
    "simhash_neardup",
    "decontaminate",
    "frequent_ngrams",
    "gopher_repetition",
    "segment_dedup",
    "global_shuffle",
    "text_normalize",
    "mixture_report",
    "chunk_overlap",
    "stratified_sample",
    "pretrain_corpus",
    "hash_split",
    "corpus_curation",
    "mm_features",
    "mm_resize",
    "mm_frame_sample",
    # never driver-checked: time series / event analytics
    "resample_ohlc",
    "gap_fill_locf",
    "daily_active_cumulative",
    "funnel_conversion",
    "anomaly_p95",
    "rollup_reuse_daily_monthly",
    "e5_running_distinct",
    # never driver-checked: SQL surfaces
    "sql_q6_revenue",
    "sql_correlated_subquery",
    "sql_exists_subquery",
    "sql_nested_agg_subquery",
    "sql_recursive_cte",
    "sql_lateral_topk",
    "sql_group_by_all",
    # never driver-checked: relational gap-fills
    "c2_right_join",
    "c9_nullsafe_join",
    "c10_null_aware_anti",
    "c4b_shuffle_hash_hint",
    "g1c_union_missing_cols",
    "g2b_setops_all",
    "e1b_percent_rank",
    "e1c_ntile",
    "e3b_interval_frame",
    "d7b_string_agg",
    "d9_mode_bool_agg",
    "d10_bitwise_agg",
    "b5b_try_cast",
    "f3_pagination",
    "skew_salted_join",
    "bucketed_join",
    "incremental_merge",
    # never driver-checked: modern Spark-4 / UDF / io surfaces
    "h7_variant",
    "h8_xml_extract",
    "k5_arrow_udf",
    "k6_map_in_arrow",
    "k7_cogroup_asof",
    "k8_grouped_agg_udaf",
    "a9_python_datasource",
    "a10_orc_roundtrip",
    "a11_text_roundtrip",
    "a12_zstd_parquet",
    "a13_compact_small_files",
    "a14_clustered_layout",
    "a15_file_lineage",
    "j8_foreach_batch_sink",
    "j9_stream_stream_join",
]

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
