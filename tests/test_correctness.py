"""In-repo mirror of the driver's t2 correctness gate.

Parametrized over every registered query: run the Spark plan and the
DuckDB oracle on the same sf dir, compare row count + schema (column
names) + exact values order-insensitively. Queries without an oracle get
a rows-only sanity check.
"""

from __future__ import annotations

import pytest

from etl_data_pipeline_spark.plans import QUERIES, ORACLES, load_all_plans
from tests.conftest import SF_DIR, assert_frames_match

load_all_plans()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, oracle):
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = oracle.execute(ORACLES[name]).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(name, spark):
    # toPandas (not count) so every column is actually materialized —
    # count() lets Spark prune columns and can hide evaluation errors
    pdf = QUERIES[name](spark, SF_DIR).toPandas()
    assert len(pdf.columns) > 0
