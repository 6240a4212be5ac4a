"""etl_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``843098306/ETL-Data-Pipeline`` (an ETL/pipeline repo: extract
from files, clean/validate, transform with filters/joins/aggregations,
load to files), re-expressed Spark-first (DataFrame ops + Spark SQL so
Catalyst/Tungsten pick the physical strategy), and extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

The scored surface is the registry in :mod:`etl_data_pipeline_spark.plans`:
every operator from ``SURVEY.md §2`` is one named query with a matching
DuckDB oracle SQL string.
"""

from etl_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
