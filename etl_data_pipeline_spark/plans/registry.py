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
    # -- round 10: set MECHANICALLY from COVERAGE_AUDIT.json
    # summary.suggested_priority.  This window drains 50 of the 68-name
    # oldest-evidence relational overflow (infra-drift-only staleness:
    # the tpch_q7/17/19/22 four, the d5/e1/g-family, the dq/profile/
    # pivot warehouse set, then the a/b/c relational core), leaving an
    # 18-name residue for round 11 — one round from a fully fresh
    # 271/271 evidence base.  From this round the emulator also records
    # per-run (file, func, AST-hash) traces (TRACES_r10.json), so these
    # rows certify exactly the code they executed.  Registry growth
    # stays FROZEN until the overflow drains. ----
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q22_idle_customers",
    "tpch_q7_volume",
    "cdc_latest_per_key",
    "d5b_cube",
    "d5c_grouping_sets",
    "date_spine",
    "dq_audit",
    "histogram_totalprice",
    "pivot_wide",
    "scd2_intervals",
    "stats_corr",
    "unpivot_long",
    "d7b_string_agg",
    "e1b_percent_rank",
    "e1c_ntile",
    "g2b_setops_all",
    "h4b_array_setops",
    "b5b_try_cast",
    "d9_mode_bool_agg",
    "f3_pagination",
    "profile_table",
    "dq_fk_orphans",
    "fuzzy_levenshtein",
    "rfm_segmentation",
    "b5c_try_arithmetic",
    "benford_digit_audit",
    "d5d_grouping_id",
    "data_skew_report",
    "dq_expectations",
    "e1d_cume_dist_nth",
    "f2b_topk_with_ties",
    "skyline_price_size",
    "table_diff",
    "weighted_median",
    "a1_parquet_scan",
    "a5_nanos_ingest",
    "b1_project_derive",
    "b2_filter_predicates",
    "b3_case_when",
    "b4_null_handling",
    "b5_casts",
    "c1_inner_join",
    "c2_full_outer_join",
    "c3_left_anti",
    "c3_left_semi",
    "c5_cross_join",
    "c6_range_join",
    "c6b_banded_range_join",
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
