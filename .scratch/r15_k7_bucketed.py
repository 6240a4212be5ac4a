"""k7_cogroup_asof A/B: per-user cogroup groups (current) vs per-BUCKET
cogroup groups with pd.merge_asof(by=user) inside (variant).

Guide §4: the cost of grouped-Python surfaces is per-group — one Arrow
round-trip + pandas frame construction + merge per KEY.  Bucketing the
cogroup key to pmod(user_id, B) keeps the cogrouped-applyInPandas
surface (two aligned frames per group) while cutting the group count
from n_users to B; merge_asof(by=user_id) inside reproduces the exact
per-user backward-asof semantics.  Results invariant to B by
construction (asof matches never cross users).  No (user_id, ts)
duplicate clicks exist at any sf (checked via DuckDB), so asof picks
are unambiguous.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="k7-ab")
spark.sparkContext.setLogLevel("ERROR")


def variant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    nb = max(64, spark.sparkContext.defaultParallelism * 2)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.pmod(F.col("user_id"), F.lit(nb)).alias("bkt"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("click_ts"),
        F.pmod(F.col("user_id"), F.lit(nb)).alias("bkt"),
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "click_event_id",
                         "click_ts"]
            )
        left = left.sort_values("ts")
        right = right.sort_values("click_ts")
        out = pd.merge_asof(
            left,
            right[["click_ts", "click_event_id", "u"]],
            left_on="ts",
            right_on="click_ts",
            left_by="user_id",
            right_by="u",
            direction="backward",
        )
        out["click_event_id"] = out["click_event_id"].astype("Int64")
        return out[["event_id", "user_id", "ts", "click_event_id",
                    "click_ts"]]

    merged = (
        purchases.groupBy("bkt")
        .cogroup(clicks.groupBy("bkt"))
        .applyInPandas(
            merge,
            schema=("event_id long, user_id long, ts timestamp,"
                    " click_event_id long, click_ts timestamp"),
        )
    )
    return merged.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("purchase_ts"),
        "click_event_id",
        F.col("click_ts").cast("string").alias("click_ts"),
    )


cur = QUERIES["k7_cogroup_asof"]
rows_cur = sorted(map(tuple, cur(spark, SF).collect()))
rows_var = sorted(map(tuple, variant(spark, SF).collect()))
assert rows_cur == rows_var, (len(rows_cur), len(rows_var),
                              rows_cur[:2], rows_var[:2])
print(f"IDENTICAL: {len(rows_cur)} rows", flush=True)

for rnd in range(4):
    for name, fn in [("current", cur), ("variant", variant)]:
        t0 = time.monotonic()
        fn(spark, SF).collect()
        print(f"round {rnd} {name}: {time.monotonic()-t0:.2f}s", flush=True)
spark.stop()
