"""Interleaved A/B for the connected-components loop restructure
(r15 optimization round, continuation session).

A = current HEAD loop (3 actions/round: checkpoint star, signature
    scan, checkpoint symmetrized-distinct e)
B = restructured loop (1 action/round: checkpoint star with the
    signature riding it as an Observation; e = lazy narrow union)

Runs neardup_clusters end-to-end (the only registered consumer) with
each variant, interleaved ABAB x3 after one untimed warm, in ONE
SparkSession, clearing the persist cache between runs.  Asserts both
variants return identical (doc_id, component, is_canonical) row sets
every time, and prints per-run wall seconds + per-variant job counts.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from etl_data_pipeline_spark.session import get_spark  # noqa: E402
from etl_data_pipeline_spark.catalog import load_table  # noqa: E402
from etl_data_pipeline_spark.operators.text import (  # noqa: E402
    minhash_lsh_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("r15b-cc-ab")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def variant_a(edges):
    """HEAD's loop, inlined verbatim."""
    from etl_data_pipeline_spark.operators.graph import _symmetrize
    from etl_data_pipeline_spark.materialize import cut_lineage

    e = edges.select("u", "v").filter(F.col("u") != F.col("v"))
    e = cut_lineage(_symmetrize(e))
    prev_sig = None
    rounds = 0
    star = e
    for _ in range(50):
        rounds += 1
        mins = e.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("u", "mv").alias("m"))
        ls = (
            e.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        rest = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        star = (
            mins2.select("u", F.col("m").alias("v"))
            .unionByName(rest)
            .distinct()
            .transform(cut_lineage)
        )
        sig_row = star.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (int(sig_row["c"]), int(sig_row["h"]))
        if sig == prev_sig:
            break
        prev_sig = sig
        e = cut_lineage(_symmetrize(star))
    return star.groupBy("u").agg(F.min("v").alias("component")), rounds


def variant_b(edges):
    """Restructured loop."""
    from pyspark.sql import Observation
    from etl_data_pipeline_spark.operators.graph import _symmetrize
    from etl_data_pipeline_spark.materialize import cut_lineage

    e = edges.select("u", "v").filter(F.col("u") != F.col("v"))
    e = cut_lineage(_symmetrize(e))
    prev_sig = None
    rounds = 0
    star = e
    for _ in range(50):
        rounds += 1
        mins = e.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("u", "mv").alias("m"))
        ls = (
            e.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        rest = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        obs = Observation()
        star = (
            mins2.select("u", F.col("m").alias("v"))
            .unionByName(rest)
            .distinct()
            .observe(
                obs,
                F.count(F.lit(1)).alias("c"),
                F.coalesce(
                    F.bit_xor(F.xxhash64("u", "v")), F.lit(0)
                ).alias("h"),
            )
            .transform(cut_lineage)
        )
        m = obs.get
        sig = (int(m["c"]), int(m["h"]))
        if sig == prev_sig:
            break
        prev_sig = sig
        e = star.unionByName(
            star.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    return star.groupBy("u").agg(F.min("v").alias("component")), rounds



def variant_c(edges):
    """Lazy-union only: keep the separate signature scan (no Observation),
    drop the in-loop symmetrize distinct + second checkpoint."""
    from etl_data_pipeline_spark.operators.graph import _symmetrize
    from etl_data_pipeline_spark.materialize import cut_lineage

    e = edges.select("u", "v").filter(F.col("u") != F.col("v"))
    e = cut_lineage(_symmetrize(e))
    prev_sig = None
    rounds = 0
    star = e
    for _ in range(50):
        rounds += 1
        mins = e.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("u", "mv").alias("m"))
        ls = (
            e.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        rest = (
            ls.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        star = (
            mins2.select("u", F.col("m").alias("v"))
            .unionByName(rest)
            .distinct()
            .transform(cut_lineage)
        )
        sig_row = star.agg(
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        sig = (int(sig_row["c"]), int(sig_row["h"]))
        if sig == prev_sig:
            break
        prev_sig = sig
        e = star.unionByName(
            star.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
    return star.groupBy("u").agg(F.min("v").alias("component")), rounds


def run(variant):
    spark.catalog.clearCache()
    d = load_table(spark, SF_DIR, "documents")
    pairs = minhash_lsh_pairs(
        d, threshold=0.5, num_hashes=16, band_size=4
    ).select("a", "b")
    edges = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    import uuid
    grp = uuid.uuid4().hex
    sc.setJobGroup(grp, "ab")
    t0 = time.time()
    assignments, rounds = variant(edges)
    labels = d.select("doc_id").join(
        assignments.select(F.col("u").alias("doc_id"), "component"),
        "doc_id",
        "left",
    )
    out = labels.select(
        "doc_id",
        F.coalesce("component", F.col("doc_id")).alias("component"),
    ).withColumn("is_canonical", F.col("component") == F.col("doc_id"))
    rows = out.collect()
    dt = time.time() - t0
    njobs = len(sc.statusTracker().getJobIdsForGroup(grp))
    sc.setJobGroup("", "")
    return dt, rounds, njobs, sorted((r[0], r[1], r[2]) for r in rows)


# one untimed warm (shuffle files / codegen), then interleaved ABC x4
run(variant_a)
ref = None
best = {}
for i in range(4):
    for name, v in (("A_head", variant_a), ("B_obs", variant_b), ("C_lazy", variant_c)):
        dt, rounds, njobs, rows = run(v)
        if ref is None:
            ref = rows
        assert rows == ref, f"{name} diverged! n={len(rows)}"
        best[name] = min(best.get(name, 1e9), dt)
        print(f"pass {i} {name}: {dt:.2f} s  rounds={rounds}  jobs={njobs}  n_rows={len(rows)}", flush=True)
print("min-of-4:", {k: round(v, 2) for k, v in best.items()})
print("identical outputs across all runs:", len(ref), "rows")
spark.stop()
