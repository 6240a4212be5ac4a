#!/usr/bin/env python
"""Re-measure the BASELINE.md PySpark column — plain formulations.

BASELINE.md's original PySpark numbers were measured at local[8]; bench.py
runs at local[$SPARK_GRAFT_CPUS] (default 32). To keep the 2x bench bound
same-hardware honest, this script measures the SAME plain baseline
formulations (the ones BASELINE.md describes: double sums, single
row_number window, one exact + one approx distinct, naive HOF cosine)
under the SAME core count and warm-run policy as bench.py (3 runs per
query, best of runs 2-3 reported).

Usage: SPARK_GRAFT_CPUS=32 python tools/measure_baseline.py
Prints one JSON line mirroring bench.py's shape.

The formulations here are deliberately NOT the engine's registered
queries: they skip the oracle-parity costs (DECIMAL(38,s) sums, three
exact distincts, four ranking functions, deterministic tiebreaks) so the
engine's bench is always compared against the cheaper plain form.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from etl_data_pipeline_spark.catalog import load_table  # noqa: E402


def q1_plain(spark: SparkSession, d: str) -> DataFrame:
    li = load_table(spark, d, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_plain(spark: SparkSession, d: str) -> DataFrame:
    c = load_table(spark, d, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, d, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, d, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"))
        .limit(10)
    )


def q5_plain(spark: SparkSession, d: str) -> DataFrame:
    r = load_table(spark, d, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, d, "nation")
    c = load_table(spark, d, "customer")
    o = load_table(spark, d, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, d, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def window_rank_plain(spark: SparkSession, d: str) -> DataFrame:
    o = load_table(spark, d, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        ).filter(F.col("rn") <= 3)
    )


def distinct_agg_plain(spark: SparkSession, d: str) -> DataFrame:
    li = load_table(spark, d, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def events_tumbling_plain(spark: SparkSession, d: str) -> DataFrame:
    ev = load_table(spark, d, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("value").alias("total_value"),
        )
    )


def wordcount_plain(spark: SparkSession, d: str) -> DataFrame:
    docs = load_table(spark, d, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


def cosine_topk_naive(spark: SparkSession, d: str) -> DataFrame:
    """The naive per-pair HOF formulation (BASELINE.md's PySpark number)."""
    e = load_table(spark, d, "embeddings")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    return (
        pairs.withColumn(
            "cosine",
            dot(F.col("va"), F.col("vb"))
            / F.sqrt(dot(F.col("va"), F.col("va")) * dot(F.col("vb"), F.col("vb"))),
        )
        .select("a", "b", "cosine")
        .orderBy(F.desc("cosine"))
        .limit(10)
    )


def knn_top3_naive(spark: SparkSession, d: str) -> DataFrame:
    """Plain exact top-3 kNN per vector: HOF cosine over the all-pairs
    join + a ranking window — the formulation a plain PySpark user
    writes; baseline for ``i6c_quantized_rerank`` (same output contract:
    top-3 exact-cosine neighbors per query)."""
    e = load_table(spark, d, "embeddings")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    a = e.select(F.col("vec_id").alias("q"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("n"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("q") != F.col("n")).withColumn(
        "cosine",
        dot(F.col("va"), F.col("vb"))
        / F.sqrt(dot(F.col("va"), F.col("va")) * dot(F.col("vb"), F.col("vb"))),
    )
    w = Window.partitionBy("q").orderBy(F.desc("cosine"), F.asc("n"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q", "n", "cosine")
    )


def minhash_lsh_plain(spark: SparkSession, d: str) -> DataFrame:
    """Plain MinHash-LSH near-dup (the formulation a plain PySpark user
    writes from the textbook recipe): explode tokens 16x — one row per
    (doc, token, permutation) — BEFORE the min-aggregate (the 16x row
    amplification the engine's ``_minhash_wide`` avoids), long-format
    signatures, band keys via collect_list, an UNCAPPED band-bucket
    self-join (no oversized-bucket divert, no df-cap), and an exact
    Jaccard verify over the full token stream.  Same output contract as
    ``i4b_minhash_lsh``: (a, b, jaccard) at threshold 0.5."""
    p = 2_147_483_647
    docs = load_table(spark, d, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    # pmod, not abs(...)%: abs(Integer.MIN_VALUE) stays negative under
    # non-ANSI overflow and % keeps the dividend's sign (ADVICE r8) —
    # pmod keeps h in [0, p) so buckets match the engine's contract.
    h = toks.withColumn("h", F.pmod(F.hash("token").cast("long"), F.lit(p)))
    sig = (
        h.select(
            "doc_id",
            "h",
            F.explode(F.array(*[F.lit(i) for i in range(16)])).alias("i"),
        )
        .withColumn(
            "mh",
            F.pmod(
                (F.col("i") * 37 + 11) * F.col("h")
                + (F.col("i") * 104729 + 17),
                F.lit(p),
            ),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("mh").alias("mh"))
    )
    bands = (
        sig.withColumn("band", (F.col("i") / F.lit(4)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "mh"))),
                    lambda s: s["mh"].cast("string"),
                ),
                "_",
            ).alias("key")
        )
    )
    x = bands.select("band", "key", F.col("doc_id").alias("a"))
    y = bands.select(
        F.col("band").alias("band_y"),
        F.col("key").alias("key_y"),
        F.col("doc_id").alias("b"),
    )
    cand = (
        x.join(
            y,
            (x.band == y.band_y)
            & (x.key == y.key_y)
            & (F.col("a") < F.col("b")),
        )
        .select("a", "b")
        .distinct()
    )
    counts = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    ta = toks.select(F.col("doc_id").alias("a"), "token")
    tb = toks.select(F.col("doc_id").alias("b"), "token")
    inter = (
        cand.join(ta, "a").join(tb, ["b", "token"]).groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = counts.select(F.col("doc_id").alias("a"), F.col("n_tok").alias("na"))
    nb = counts.select(F.col("doc_id").alias("b"), F.col("n_tok").alias("nb"))
    jacc = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "a").join(nb, "b")
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= 0.5)
        .select("a", "b", "jaccard")
    )


BASELINE_QUERIES = {
    "q1_pricing_summary": q1_plain,
    "q3_topk_join": q3_plain,
    "q5_multi_join": q5_plain,
    "window_rank": window_rank_plain,
    "distinct_agg": distinct_agg_plain,
    "events_tumbling": events_tumbling_plain,
    "wordcount": wordcount_plain,
    "cosine_topk": cosine_topk_naive,
    "i6c_quantized_rerank": knn_top3_naive,
    "i4b_minhash_lsh": minhash_lsh_plain,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("baseline")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Same driver memory as bench.py's engine session: at the 1g
        # default the naive-kNN/uncapped-LSH twins sit on the GC edge
        # (observed round 9: one run passed with GCLocker retry
        # warnings, the identical next run died with Java heap OOM) —
        # and a GC-thrashing denominator would flatter the engine.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name, fn in BASELINE_QUERIES.items():
        warm = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            if i > 0:
                warm = min(warm, dt)
        timings[name] = round(warm, 4)
    print(
        json.dumps(
            {
                "metric": "baseline_plain_warm_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "")),
                "cpus": cpus,
                "method": "3 runs per query in one session; min of runs 2-3",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
