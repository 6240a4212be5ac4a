"""Profile incremental_neardup: current vs materialized-cand variant.

Hypothesis (guide §1/§5): the candidate band-join subtree is recomputed
by every consumer (touched a-side, touched b-side, inter join, left
join), and docs_t (semi-join behind the whole cand subtree) is
recomputed for each of the three token-stream consumers inside
exact_jaccard_on_pairs — so the band join runs ~5x and the corpus scan
~3x more than needed.  Variant adds materialize(cand) + materialize on
the touched-doc token stream feed.  Asserts identical sorted output.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.materialize import materialize
from etl_data_pipeline_spark.operators.text import (
    LSH_MAX_BUCKET_SIZE,
    exact_jaccard_on_pairs,
    minhash_bands,
)
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="incneardup-profile")
spark.sparkContext.setLogLevel("ERROR")


def variant(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    idx = minhash_bands(corpus)
    nb = minhash_bands(new)
    allb = materialize(
        idx.withColumn("is_new", F.lit(False)).unionByName(
            nb.withColumn("is_new", F.lit(True))
        )
    )
    wb = Window.partitionBy("band", "band_key")
    allb = (
        allb.withColumn("bucket_n", F.count(F.lit(1)).over(wb))
        .filter(F.col("bucket_n") <= LSH_MAX_BUCKET_SIZE)
        .drop("bucket_n")
    )
    left = allb.filter(F.col("is_new")).select(
        F.col("band").alias("band_l"),
        F.col("band_key").alias("key_l"),
        F.col("doc_id").alias("a"),
    )
    right = allb.select(
        F.col("band").alias("band_r"),
        F.col("band_key").alias("key_r"),
        F.col("doc_id").alias("b"),
    )
    cand = materialize(
        left.join(
            right,
            (left.band_l == right.band_r)
            & (left.key_l == right.key_r)
            & (left.a != right.b),
        )
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    touched = materialize(
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    docs_t = d.join(touched, "doc_id", "left_semi")
    jac = exact_jaccard_on_pairs(docs_t, cand)
    return jac.filter(F.col("jaccard") >= 0.5).select("a", "b", "jaccard")


cur = QUERIES["incremental_neardup"]

# correctness first
rows_cur = sorted(map(tuple, cur(spark, SF).collect()))
rows_var = sorted(map(tuple, variant(spark, SF).collect()))
assert rows_cur == rows_var, (len(rows_cur), len(rows_var))
print(f"IDENTICAL: {len(rows_cur)} rows", flush=True)

# interleaved timing, 4 rounds, drop round 0
for rnd in range(4):
    for name, fn in [("current", cur), ("variant", variant)]:
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, SF).collect()
        dt = time.monotonic() - t0
        print(f"round {rnd} {name}: {dt:.2f}s", flush=True)
spark.stop()
