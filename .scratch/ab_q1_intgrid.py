"""Interleaved A/B: current q1 (per-expression FLOOR grids) vs the
integer-derived-grid rewrite vs the plain unsound twin, at sf0.1.
Run on a quiet host; warm min over 3 measured rounds, interleaved."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.functions.canonical import (
    cents_grid,
    cents_recombine,
    cents_sum,
    cents_sum_wide,
)
from etl_data_pipeline_spark.plans.relational import q1_pricing_summary
from etl_data_pipeline_spark.session import get_spark
from tools.measure_baseline import q1_plain  # noqa: E402

_HILO = 1_000_000


def q1_intgrid(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
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
            F.sum((v4 / _HILO).cast("long")).alias("_dp_hi"),
            F.sum(v4 % _HILO).alias("_dp_lo"),
            F.sum((v6 / _HILO).cast("long")).alias("_ch_hi"),
            F.sum(v6 % _HILO).alias("_ch_lo"),
            F.sum(d_c).alias("_sum_disc_c"),
            F.count(F.lit(1)).alias("count_order"),
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


def main():
    sf = "/root/testdata/sf0.1"
    spark = get_spark(app_name="ab-q1")
    spark.sparkContext.setLogLevel("ERROR")

    variants = {
        "old": q1_pricing_summary,
        "new": q1_intgrid,
        "plain": q1_plain,
    }
    # correctness first: old vs new must be value-identical
    rows_old = {tuple(r[:2]): r for r in sorted(q1_pricing_summary(spark, sf).collect())}
    rows_new = {tuple(r[:2]): r for r in sorted(q1_intgrid(spark, sf).collect())}
    assert set(rows_old) == set(rows_new)
    for k in rows_old:
        a, b = rows_old[k], rows_new[k]
        for fld in ("sum_qty", "sum_base_price", "sum_disc_price",
                    "sum_charge", "avg_qty", "avg_price", "avg_disc",
                    "count_order"):
            va, vb = a[fld], b[fld]
            assert va == vb, (k, fld, va, vb, va - vb)
    print("value-identical: OK", flush=True)

    mins = {k: float("inf") for k in variants}
    for rnd in range(4):  # round 0 = warmup
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            dt = time.perf_counter() - t0
            if rnd > 0:
                mins[name] = min(mins[name], dt)
            print(f"  r{rnd} {name}: {dt:.3f}s", flush=True)
    print({k: round(v, 4) for k, v in mins.items()})
    print(f"ratio old/plain = {mins['old']/mins['plain']:.3f}")
    print(f"ratio new/plain = {mins['new']/mins['plain']:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
