"""Round-15 q1 paired-ratio re-profile (VERDICT r14 item 7 — trigger
fired: r14 local 1.453, r15 lc 1.465 > the 1.45 lc pin, two
consecutive >1.45 readings).

No code in q1's trace chain changed since r13 (git: relational.py /
canonical.py / catalog.py / session.py untouched since a6e0852), so
the drift is measurement, not code — this profile DECOMPOSES the
engine-vs-plain delta to find where the ~1.45x goes:

  plain    — the BASELINE.md twin (double sums, F.avg)
  grid     — plain shape + cents_grid recovery of ep/d/t (isolates the
             3 FLOOR(+0.5) recoveries)
  nosplit  — full integer-grid arithmetic but SINGLE long sums for
             v4/v6 (isolates the hi/lo overflow split's 4 extra
             buffers; correctness-equivalent at sf0.1 scale only)
  engine   — the registered q1_pricing_summary (grid + hi/lo split)

6 interleaved rounds in one local[32] session at sf0.1; round 0
dropped as warmup; report min + all samples per variant.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.functions.canonical import cents_grid
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="q1-profile")
spark.sparkContext.setLogLevel("ERROR")


def plain(spark, d):
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


def grid(spark, d):
    li = load_table(spark, d, "lineitem")
    ep_c = cents_grid(F.col("l_extendedprice"), 2)
    d_c = cents_grid(F.col("l_discount"), 2)
    t_c = cents_grid(F.col("l_tax"), 2)
    disc_price = (ep_c * (F.lit(100) - d_c)).cast("double") / 1e4
    charge = (ep_c * (F.lit(100) - d_c)).cast("double") / 1e4 * (
        1 + t_c.cast("double") / 100.0
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(ep_c) / 100.0).alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def nosplit(spark, d):
    li = load_table(spark, d, "lineitem")
    ep_c = cents_grid(F.col("l_extendedprice"), 2)
    d_c = cents_grid(F.col("l_discount"), 2)
    t_c = cents_grid(F.col("l_tax"), 2)
    v4 = ep_c * (F.lit(100) - d_c)
    v6 = v4 * (F.lit(100) + t_c)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            (F.sum(ep_c) / 100.0).alias("sum_base_price"),
            (F.sum(v4) / 1e4).alias("sum_disc_price"),
            (F.sum(v6) / 1e6).alias("sum_charge"),
            F.sum(d_c).alias("_sum_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


VARIANTS = {
    "plain": plain,
    "grid": grid,
    "nosplit": nosplit,
    "engine": lambda s, d: QUERIES["q1_pricing_summary"](s, d),
}

samples = {k: [] for k in VARIANTS}
for rnd in range(6):
    for name, fn in VARIANTS.items():
        t0 = time.monotonic()
        fn(spark, SF).collect()
        dt = time.monotonic() - t0
        if rnd > 0:
            samples[name].append(round(dt, 4))
        print(f"round {rnd} {name}: {dt:.3f}s", flush=True)

out = {
    "samples": samples,
    "mins": {k: min(v) for k, v in samples.items()},
}
out["ratios_vs_plain"] = {
    k: round(out["mins"][k] / out["mins"]["plain"], 3) for k in VARIANTS
}
print(json.dumps(out), flush=True)
