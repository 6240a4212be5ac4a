"""i6c_quantized_rerank A/B: per-pair HOF self-norms (current) vs
norm-hoisted rerank (variant).

The rerank's cosine_col(vq, vn) evaluates THREE interpreted HOF folds
per candidate pair: dot(vq,vn), dot(vq,vq), dot(vn,vn).  The two
self-norms depend only on the vector, so hoisting them into the eq/en
projections computes each ONCE PER VECTOR instead of once per pair
(n_cand=20x fewer evaluations), guide §2.3 "don't compute things you
throw away" applied to expressions.  Bit-identical: the same HOF fold
over the same array yields the same double wherever it is evaluated.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.operators.similarity import (
    knn,
    quantize_embeddings,
)
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="i6c-ab")
spark.sparkContext.setLogLevel("ERROR")


def dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def variant(spark, sf_dir):
    embeddings = load_table(spark, sf_dir, "embeddings")
    k, n_cand = 3, 20
    cand = knn(spark, quantize_embeddings(embeddings), k=n_cand, n_blocks=None)
    n2 = dot(F.col("embedding"), F.col("embedding"))
    eq = embeddings.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("vq"),
        n2.alias("nq2"),
    )
    en = embeddings.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("vn"),
        n2.alias("nn2"),
    )
    rer = (
        cand.select("vec_id", "neighbor")
        .join(eq, F.col("vec_id") == F.col("q_id"))
        .join(en, F.col("neighbor") == F.col("n_id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("vq"), F.col("vn"))
                / F.sqrt(F.col("nq2") * F.col("nn2")),
                6,
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        rer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "neighbor", "cosine")
    )


cur = QUERIES["i6c_quantized_rerank"]
rows_cur = sorted(map(tuple, cur(spark, SF).collect()))
rows_var = sorted(map(tuple, variant(spark, SF).collect()))
assert rows_cur == rows_var, (len(rows_cur), len(rows_var))
print(f"IDENTICAL: {len(rows_cur)} rows", flush=True)

for rnd in range(4):
    for name, fn in [("current", cur), ("variant", variant)]:
        t0 = time.monotonic()
        fn(spark, SF).collect()
        print(f"round {rnd} {name}: {time.monotonic()-t0:.2f}s", flush=True)
spark.stop()
