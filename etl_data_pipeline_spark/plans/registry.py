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
    # -- round 13: set MECHANICALLY from COVERAGE_AUDIT.json
    # summary.suggested_priority.  Head: the 23-query touched cohort
    # (the round's ANN build rewrite — hash seeding + chunked
    # assignment — dirtied the whole vectors/similarity family), then
    # the oldest-evidence rotation over the r7 tier (h2-h6 scalar
    # functions, the j5-j11 streaming block, i4/i4b/i4c, the near-dup
    # graph family).  36 queries tie at r7 evidence and only 27 slots
    # remain after the touched cohort; the audit's within-tier order is
    # deterministic (alphabetical), which leaves q3_topk_join /
    # q5_multi_join / pretrain_corpus / neardup_triangles /
    # pagerank_neardup (+4 more) as the r14 overflow — q5 (SURVEY S2
    # row C7) is the one S2 row still on r7 driver evidence after this
    # window; it was spot-checked green this session
    # (.scratch/r13_q5_spotcheck.log) and heads the r14 rotation.
    "i6c_quantized_rerank",
    "cosine_topk",
    "embedding_neardup",
    "ivf2_recall",
    "ivf_ann",
    "ivf_recall",
    "ivf2_ann",
    "pq_ann",
    "pq_recall",
    "i7_knn",
    "ann_multiprobe_recall",
    "ann_recall",
    "ann_lsh",
    "ann_multiprobe",
    "mmr_diversified_topk",
    "hybrid_rrf_search",
    "i6b_cosine_topk_hof",
    "i8_centroid_classify",
    "i8b_centroid_accuracy",
    "kmeans_lloyd",
    "embedding_clip_stats",
    "i9_multimodal_join",
    "vector_centroids",
    "h1c_regexp_extract_all",
    "h2_datetime_funcs",
    "h2b_datetime_funcs_more",
    "h3_math_funcs",
    "h4_array_funcs",
    "h5_map_funcs",
    "h6_json_extract",
    "h6b_from_json",
    "hash_split",
    "i4_jaccard_pairs",
    "i4b_minhash_lsh",
    "i4c_ngram_jaccard",
    "j10_stream_session_windows",
    "j11_stream_update_counts",
    "j5_stream_watermark",
    "j6_stream_dedup",
    "j7_stateful_totals",
    "j8_foreach_batch_sink",
    "j9_stream_stream_join",
    "kcore_peel",
    "lsh_bucket_stats",
    "minhash_est_quality",
    "mm_decode_audio",
    "mm_resize",
    "neardup_clusters",
    "neardup_degree_hist",
    "neardup_link_predict",
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
