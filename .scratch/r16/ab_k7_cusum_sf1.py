"""VERDICT r15 item 7: re-measure the bucketed k7_cogroup_asof and
cusum_changepoint at sf1 — one interleaved same-session A/B each,
per-user keying (pre-r15) vs the registered bucketed form, identical
outputs asserted first.  Proves the per-group-overhead model (guide §4)
at a second decade and would surface any bucket-size pathology.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd
from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.plans.timeseries import _cusum_bucket
from etl_data_pipeline_spark.session import get_spark

SF = "/root/repo/.scratch/r16/sf1"
load_all_plans()
spark = get_spark(app_name="r16-k7-cusum-sf1-ab")
spark.sparkContext.setLogLevel("ERROR")


def k7_per_user(spark, sf_dir):
    """Pre-r15 formulation: cogroup keyed on raw user_id (one Arrow
    round-trip + two frame builds + one merge per USER)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
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
            right[["click_ts", "click_event_id"]],
            left_on="ts",
            right_on="click_ts",
            direction="backward",
        )
        out["click_event_id"] = out["click_event_id"].astype("Int64")
        return out

    merged = (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
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


def cusum_per_user(spark, sf_dir):
    """Pre-r15 formulation: grouped-map keyed on raw user_id (the
    bucket kernel handles a one-user frame identically)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v"),
    )
    return ev.groupBy("user_id").applyInPandas(
        _cusum_bucket,
        schema="user_id long, n_events long, n_alarms long, max_s long",
    )


for qname, old_fn in (
    ("cusum_changepoint", cusum_per_user),
    ("k7_cogroup_asof", k7_per_user),
):
    cur = QUERIES[qname]
    rows_cur = sorted(map(tuple, cur(spark, SF).collect()))
    rows_old = sorted(map(tuple, old_fn(spark, SF).collect()))
    assert rows_cur == rows_old, (qname, len(rows_cur), len(rows_old))
    print(f"{qname}: IDENTICAL {len(rows_cur)} rows at sf1", flush=True)
    for rnd in range(3):
        for name, fn in (("per-user", old_fn), ("bucketed", cur)):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn(spark, SF).collect()
            print(f"  {qname} round {rnd} {name}: "
                  f"{time.monotonic()-t0:.2f}s", flush=True)
spark.stop()
