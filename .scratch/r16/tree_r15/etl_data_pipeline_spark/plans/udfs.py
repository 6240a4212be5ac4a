"""UDF surface queries (SURVEY.md §2 category K).

K1 row-at-a-time Python UDF exists as the escape hatch (never in hot
paths); K2/K3 are the Arrow-vectorized forms that actually scale; K4 is
the UDTF demo.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.plans.registry import query


@query(
    "k1_scalar_udf",
    oracle="""
    SELECT c_custkey, REVERSE(UPPER(c_name)) AS shouted_rev
    FROM customer WHERE c_custkey % 20 = 0
    """,
)
def k1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: row-at-a-time Python UDF (escape hatch; restricted input so the
    slow path stays small — the point is the boundary, not throughput)."""

    @F.udf(returnType=T.StringType())
    def shouted_rev(s: str) -> str:
        return s.upper()[::-1]

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    return c.select("c_custkey", shouted_rev("c_name").alias("shouted_rev"))


@query(
    "k2_pandas_udf_norm",
    oracle="""
    SELECT vec_id,
           ROUND(SQRT(list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[]))), 6) AS vec_norm
    FROM embeddings
    """,
)
def k2_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2: Arrow-vectorized scalar pandas_udf (numpy per batch) — the
    pattern every hot Python kernel uses (cf. the cosine_topk kernel)."""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def vec_norm(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="float64")
        M = np.stack(s.to_numpy()).astype("float64")
        return pd.Series(np.round(np.sqrt((M * M).sum(axis=1)), 6), index=s.index)

    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", vec_norm("embedding").alias("vec_norm"))


@query(
    "k3_grouped_zscore",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND((c_acctbal - AVG(c_acctbal) OVER w)
                 / STDDEV_SAMP(c_acctbal) OVER w, 6) AS zscore
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
)
def k3_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3: grouped-map applyInPandas — per-segment z-score normalization
    (the canonical custom-stateless-group transform)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sd = pdf["c_acctbal"].std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "zscore": ((pdf["c_acctbal"] - mu) / sd).round(6),
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        zscore, schema="c_custkey long, c_mktsegment string, zscore double"
    )


@query(
    "k4_udtf",
    oracle="""
    SELECT doc_id, i.range AS pos, STRING_SPLIT(text, ' ')[i.range + 1] AS token
    FROM documents, RANGE(3) i
    WHERE doc_id % 50 = 0 AND i.range < LEN(STRING_SPLIT(text, ' '))
    """,
)
def k4_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: Python UDTF — one input row to many output rows (first 3 tokens
    with positions), joined laterally."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, token string")
    class FirstTokens:
        def eval(self, text: str):
            for pos, token in enumerate(text.split(" ")[:3]):
                yield pos, token

    spark.udtf.register("first_tokens", FirstTokens)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    d.createOrReplaceTempView("udtf_docs_in")
    return spark.sql(
        "SELECT t.doc_id, u.pos, u.token "
        "FROM udtf_docs_in t, LATERAL first_tokens(t.text) u"
    )
