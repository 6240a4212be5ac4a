"""Prototype: two-stage exact money sums for q1 — per-partition single
long partial sums (groupBy(spark_partition_id(), keys)), hi/lo split
applied only to the ~6 x n_partitions partial rows.  Checks exact
value identity vs the registered engine q1 and A/Bs all three
formulations interleaved."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.functions.canonical import cents_grid, cents_recombine
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="q1-twostage")
spark.sparkContext.setLogLevel("ERROR")


def twostage(spark, d):
    li = load_table(spark, d, "lineitem")
    ep_c = cents_grid(F.col("l_extendedprice"), 2)
    d_c = cents_grid(F.col("l_discount"), 2)
    t_c = cents_grid(F.col("l_tax"), 2)
    v4 = ep_c * (F.lit(100) - d_c)
    v6 = v4 * (F.lit(100) + t_c)
    hilo = 1_000_000
    part = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy(
            F.spark_partition_id().alias("_pid"),
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum("l_quantity").alias("_sq"),
            F.sum(ep_c).alias("_sep"),
            F.sum(v4).alias("_sv4"),
            F.sum(v6).alias("_sv6"),
            F.sum(d_c).alias("_sdc"),
            F.count(F.lit(1)).alias("_cnt"),
        )
    )
    return (
        part.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("_sq").alias("sum_qty"),
            (F.sum("_sep") / 100.0).alias("sum_base_price"),
            F.sum((F.col("_sv4") / hilo).cast("long")).alias("_dp_hi"),
            F.sum(F.col("_sv4") % hilo).alias("_dp_lo"),
            F.sum((F.col("_sv6") / hilo).cast("long")).alias("_ch_hi"),
            F.sum(F.col("_sv6") % hilo).alias("_ch_lo"),
            F.sum("_sdc").alias("_sum_disc_c"),
            F.sum("_cnt").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            cents_recombine(F.col("_dp_hi"), F.col("_dp_lo"), 4).alias(
                "sum_disc_price"
            ),
            cents_recombine(F.col("_ch_hi"), F.col("_ch_lo"), 6).alias(
                "sum_charge"
            ),
            (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
            (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
            (F.col("_sum_disc_c") / 100.0 / F.col("count_order")).alias(
                "avg_disc"
            ),
            "count_order",
        )
    )


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


# --- exact value-identity check (engine vs twostage), field by field ---
eng = {
    (r["l_returnflag"], r["l_linestatus"]): r.asDict()
    for r in QUERIES["q1_pricing_summary"](spark, SF).collect()
}
two = {
    (r["l_returnflag"], r["l_linestatus"]): r.asDict()
    for r in twostage(spark, SF).collect()
}
assert set(eng) == set(two), (set(eng) ^ set(two))
for k in eng:
    for col, v in eng[k].items():
        assert two[k][col] == v, (k, col, v, two[k][col])
print(f"IDENTITY OK: {len(eng)} groups, every field bit-equal", flush=True)

VARIANTS = {
    "plain": plain,
    "engine": lambda s, d: QUERIES["q1_pricing_summary"](s, d),
    "twostage": twostage,
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

mins = {k: min(v) for k, v in samples.items()}
print(json.dumps({
    "samples": samples,
    "mins": mins,
    "ratios_vs_plain": {k: round(mins[k] / mins["plain"], 3) for k in VARIANTS},
}), flush=True)
