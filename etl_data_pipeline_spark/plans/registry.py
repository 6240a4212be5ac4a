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
    # -- round 14: set MECHANICALLY from COVERAGE_AUDIT.json
    # summary.suggested_priority.  Head: the touched cohort (36 names —
    # this round's ANN-kernel cell-blocking/pipelined-mode work plus
    # the i4b token-distinct deletion dirtied the vectors AND dedup
    # families), then the r7 oldest-evidence cohort IN FULL (q3/q5/
    # pretrain_corpus/resample_ohlc/pagerank_neardup/neardup_triangles/
    # scd2 — VERDICT r13 item 2 done), then the r8 tier alphabetically
    # (cohort_retention in; the j1-j4 events block did not fit the 50
    # slots behind the forced touched cohort and leads the r15
    # rotation — VERDICT r13 item 7 deferred by the audit's mechanical
    # prescription, which the --check gate pins verbatim).
    "ivf2_ann",
    "ivf2_recall",
    "ivf_ann",
    "ivf_recall",
    "neardup_triangles",
    "pagerank_neardup",
    "i4b_minhash_lsh",
    "kcore_peel",
    "minhash_est_quality",
    "neardup_clusters",
    "neardup_degree_hist",
    "neardup_link_predict",
    "lsh_bucket_stats",
    "ann_lsh",
    "ann_multiprobe",
    "ann_multiprobe_recall",
    "ann_recall",
    "pq_ann",
    "pq_recall",
    "cosine_topk",
    "embedding_clip_stats",
    "embedding_neardup",
    "hybrid_rrf_search",
    "i6b_cosine_topk_hof",
    "i7_knn",
    "i8_centroid_classify",
    "i8b_centroid_accuracy",
    "i9_multimodal_join",
    "kmeans_lloyd",
    "mmr_diversified_topk",
    "vector_centroids",
    "pretrain_corpus",
    "q3_topk_join",
    "q5_multi_join",
    "resample_ohlc",
    "scd2_point_in_time_join",
    "a10_orc_roundtrip",
    "a11_text_roundtrip",
    "a12_zstd_parquet",
    "a13_compact_small_files",
    "a14_clustered_layout",
    "a15_file_lineage",
    "a16_fixed_width",
    "a9_python_datasource",
    "bucketed_join",
    "c4b_shuffle_hash_hint",
    "c8b_asof_forward",
    "cohort_retention",
    "dpp_partition_pruned_join",
    "event_debounce",
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
