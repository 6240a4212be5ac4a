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
    # -- round 9: set MECHANICALLY from COVERAGE_AUDIT.json
    # summary.suggested_priority (tools/coverage_audit.py).  The r8
    # function-specific residue is fully drained; this window is the
    # oldest-evidence rotation cohort (r2-era text/vector evidence:
    # i9_multimodal_join, embedding_clip_stats, the text-analysis
    # family, ...) leading the 118-name stale overflow.  Certification
    # now requires a pair unchanged at BOTH round endpoints (ADVICE
    # r8).  Registry growth stays FROZEN until the overflow drains. ----
    "i9_multimodal_join",
    "embedding_clip_stats",
    "vector_centroids",
    "doc_fingerprint",
    "i2_text_stats",
    "i3_exact_dedup",
    "i5_tfidf_topterms",
    "lang_id",
    "quality_score",
    "simhash_fingerprint",
    "token_count_est",
    "wordcount",
    "script_ratio",
    "pmi_bigrams",
    "source_kl_divergence",
    "bigram_lm_score",
    "bm25_topk",
    "containment_df_stats",
    "lang_id_confusion",
    "token_entropy",
    "unigram_lm_score",
    "chunk_overlap",
    "decontaminate",
    "frequent_ngrams",
    "global_shuffle",
    "gopher_repetition",
    "mixture_report",
    "mixture_sample",
    "pack_greedy",
    "pack_sequences",
    "redact_pii",
    "segment_dedup",
    "simhash_neardup",
    "stratified_sample",
    "text_normalize",
    "incremental_dedup",
    "dedup_survivorship",
    "pps_systematic_sample",
    "weighted_sample_topk",
    "c2_left_join",
    "c4_broadcast_join",
    "d2_global_agg",
    "d6_filtered_agg",
    "merge_upsert",
    "a4_partitioned_write",
    "a8_dynamic_partition_overwrite",
    "c2_right_join",
    "incremental_merge",
    "runtime_bloom_join",
    "tpch_q14_promo_share",
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
