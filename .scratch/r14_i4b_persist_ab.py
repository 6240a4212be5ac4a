"""A/B: exact_jaccard token-stream persist vs recompute (both with the
row-local array_distinct), at a given sf — 2 runs each, one session."""
import sys, time
sys.path.insert(0, "/root/repo")
import etl_data_pipeline_spark.operators.text as T
from etl_data_pipeline_spark.materialize import materialize
from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.session import get_spark
from pyspark.sql import functions as F

orig = T.exact_jaccard_on_pairs

def persisted(docs, cand):
    t = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("token"),
    )
    t = materialize(t)
    counts = t.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    ta = t.select(F.col("doc_id").alias("a"), "token")
    tb = t.select(F.col("doc_id").alias("b_r"), F.col("token").alias("token_b"))
    inter = (
        cand.join(ta, "a")
        .join(tb, (F.col("token") == F.col("token_b")) & (F.col("b") == F.col("b_r")))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("a"), F.col("n_tok").alias("na"))
    nb = counts.select(F.col("doc_id").alias("b"), F.col("n_tok").alias("nb"))
    return (
        cand.join(inter, ["a", "b"], "left")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
        .join(na, "a").join(nb, "b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )

spark = get_spark(app_name="i4b-persist-ab")
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1]
d = load_table(spark, sf, "documents")
for label, fn in (("recompute", orig), ("persist", persisted),
                  ("recompute2", orig), ("persist2", persisted)):
    T.exact_jaccard_on_pairs = fn
    t0 = time.monotonic()
    n = T.minhash_lsh_pairs(d, threshold=0.5, num_hashes=16, band_size=4).count()
    print(f"{label}: {n} rows {time.monotonic()-t0:.2f}s", flush=True)
    spark.catalog.clearCache()
