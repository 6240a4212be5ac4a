"""Interleaved A/B: exact-Jaccard verify stage — inverted-index double
token join (HEAD) vs array_intersect on per-doc distinct-token arrays.

Runs the full i4b_minhash_lsh pipeline with each verify variant,
interleaved x4 after one warmup, cache cleared per run; asserts the
(a, b, round(jaccard,9)) sets are identical every run.
Usage: [SPARK_GRAFT_SF_DIR=...] python r15b_jaccard_array_ab.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_data_pipeline_spark.session import get_spark  # noqa: E402
from etl_data_pipeline_spark.catalog import load_table  # noqa: E402
from etl_data_pipeline_spark.operators.text import (  # noqa: E402
    LSH_MAX_BUCKET_SIZE,
    exact_jaccard_on_pairs,
    lsh_candidate_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("r15b-jac-ab")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def jac_arrays(docs, cand):
    tok = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    ta = tok.select(F.col("doc_id").alias("a"), F.col("toks").alias("toks_a"))
    tb = tok.select(F.col("doc_id").alias("b"), F.col("toks").alias("toks_b"))
    j = (
        cand.join(ta, "a")
        .join(tb, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("toks_a", "toks_b")).cast("long").alias("inter"),
            F.size("toks_a").cast("long").alias("na"),
            F.size("toks_b").cast("long").alias("nb"),
        )
    )
    return j.withColumn(
        "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    )


def run(variant):
    spark.catalog.clearCache()
    d = load_table(spark, SF_DIR, "documents")
    cand = lsh_candidate_pairs(d, 16, 4, LSH_MAX_BUCKET_SIZE)
    t0 = time.time()
    jac = variant(d, cand)
    out = jac.filter(F.col("jaccard") >= 0.5).select("a", "b", "jaccard")
    rows = out.collect()
    dt = time.time() - t0
    return dt, sorted((r[0], r[1], round(r[2], 9)) for r in rows)


run(exact_jaccard_on_pairs)  # warmup
ref = None
best = {}
for i in range(4):
    for name, v in (("A_inverted", exact_jaccard_on_pairs), ("B_arrays", jac_arrays)):
        dt, rows = run(v)
        if ref is None:
            ref = rows
        assert rows == ref, f"{name} diverged! n={len(rows)} vs {len(ref)}"
        best[name] = min(best.get(name, 1e9), dt)
        print(f"pass {i} {name}: {dt:.2f} s  n={len(rows)}", flush=True)
print("min-of-4:", {k: round(v, 2) for k, v in best.items()})
print("identical outputs across all runs:", len(ref), "pairs")
spark.stop()
