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
#: (~50 entries checked in registration order). Round-4 rotation:
#: cumulative r01-r03 coverage left exactly 26 registered queries with
#: no driver-side CORRECTNESS row (VERDICT.md round 3, "What's missing"
#: item 1) — those 26 go first so the registry reaches 100%
#: driver-checked, followed by queries whose code or oracle CHANGED
#: this round (j5/j6/mm_resize rows-only -> exact, i4 df-cap, h1c
#: null-contract, script_ratio guard) and the brand-new round-4
#: queries. Names not listed keep registration order after these.
#: Unknown names are ignored (defensive: a renamed query must not
#: break loading). NOTE for round 5: this list holds 51 names against a
#: ~50-slot window — whichever tail entry misses a CORRECTNESS_r04 row
#: leads the round-5 rotation, along with anything newly added.
_PRIORITY = [
    # -- the 26 never-driver-checked (r01-r03) --------------------------
    # round-3 post-run stragglers
    "c8b_asof_forward",
    "interval_overlap_join",
    "script_ratio",
    "unigram_lm_score",
    # io tail
    "a9_python_datasource",
    "a10_orc_roundtrip",
    "a11_text_roundtrip",
    "a12_zstd_parquet",
    "a13_compact_small_files",
    "a14_clustered_layout",
    "a15_file_lineage",
    # relational / etl tail
    "b5b_try_cast",
    "bucketed_join",
    "skew_salted_join",
    "incremental_merge",
    "d9_mode_bool_agg",
    "d10_bitwise_agg",
    "f3_pagination",
    # modern Spark-4 / UDF / streaming tail
    "h7_variant",
    "h8_xml_extract",
    "j8_foreach_batch_sink",
    "j9_stream_stream_join",
    "k5_arrow_udf",
    "k6_map_in_arrow",
    "k7_cogroup_asof",
    "k8_grouped_agg_udaf",
    # -- changed this round (need fresh evidence) -----------------------
    "j5_stream_watermark",
    "j6_stream_dedup",
    "mm_resize",
    "i4_jaccard_pairs",
    "h1c_regexp_extract_all",
    # -- new in round 4 -------------------------------------------------
    "mm_decode_image",
    "mm_decode_audio",
    "mm_decode_video",
    "dpp_partition_pruned_join",
    "pmi_bigrams",
    "vector_centroids",
    "incremental_dedup",
    "profile_table",
    "source_kl_divergence",
    "pagerank_neardup",
    "runtime_bloom_join",
    "embedding_clip_stats",
    "j10_stream_session_windows",
    "rolling_median",
    "trend_slope",
    "a16_fixed_width",
    "event_debounce",
    "pareto_abc",
    "j11_stream_update_counts",
    "dedup_survivorship",
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
