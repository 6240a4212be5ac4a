"""Query plan registry — the driver-scored surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a callable ``(spark, sf_dir) -> DataFrame`` plus (for
SQL-expressible ops) the equivalent DuckDB oracle SQL. ``__spark_entry__``
exposes exactly this registry.
"""

from etl_data_pipeline_spark.plans.registry import (
    QUERIES,
    ORACLES,
    query,
    load_all_plans,
)

__all__ = ["QUERIES", "ORACLES", "query", "load_all_plans"]
