"""VERDICT r15 item 4: per-stage profile of the verified-pair floor
under the neardup_* block (i4b_minhash_lsh shape, sf0.1 and sf1).

Stages timed with the noop sink (guide §1.4), cache cleared between
stages, min of runs 2-3 in-session:
  S1 signatures+banding  (minhash_bands, no persist)
  S2 +bucket-size cap    (window count over (band, band_key))
  S3 +band self-join     (lsh_candidate_pairs end-to-end, persists as
                          in production)
  S4 full i4b            (S3 + array_intersect verify + threshold)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.operators.text import (
    LSH_MAX_BUCKET_SIZE,
    exact_jaccard_on_pairs,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_lsh_pairs,
)
from etl_data_pipeline_spark.session import get_spark

SFD = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spark = get_spark(app_name="r16-i4b-profile")
spark.sparkContext.setLogLevel("ERROR")
d = load_table(spark, SFD, "documents")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def s1():
    noop(minhash_bands(d, 16, 4))


def s2():
    b = minhash_bands(d, 16, 4)
    wb = Window.partitionBy("band", "band_key")
    noop(
        b.withColumn("n", F.count(F.lit(1)).over(wb))
        .filter(F.col("n") <= LSH_MAX_BUCKET_SIZE)
        .drop("n")
    )


def s3():
    noop(lsh_candidate_pairs(d, 16, 4))


def s4():
    noop(minhash_lsh_pairs(d, threshold=0.5, num_hashes=16, band_size=4))


for name, fn in (("S1_bands", s1), ("S2_capped", s2),
                 ("S3_candidates", s3), ("S4_full_i4b", s4)):
    runs = []
    for i in range(3):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        t0 = time.monotonic()
        fn()
        runs.append(time.monotonic() - t0)
    print(f"PROFILE {SFD} {name}: {min(runs[1:]):.3f}s "
          f"(runs {['%.2f' % r for r in runs]})", flush=True)

# plan shape of the candidate join (partitioning-mismatch check)
cand = lsh_candidate_pairs(d, 16, 4)
txt = cand._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
)
open("/root/repo/.scratch/r16/lsh_cand_plan.txt", "w").write(txt)
print("wrote lsh_cand_plan.txt", flush=True)
spark.stop()
