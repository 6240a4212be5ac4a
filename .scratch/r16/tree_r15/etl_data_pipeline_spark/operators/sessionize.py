"""Event-time operators: sessionization and as-of joins.

These are composition-level operators (SURVEY.md §4): Spark has native
``session_window`` for streaming/batch, but the lag-gap-cumsum batch
formulation is also provided because (a) it is the SQL-expressible oracle
form and (b) it generalizes to per-session metrics (J4).

Scale posture: both formulations shuffle once on the session key
(user_id) and then do per-partition ordered work — no cross-key state, so
they scale linearly with keys; skewed users are handled by AQE skew-join
(not relevant here — windows, not joins) or salting at the metric layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same key exceeds the gap.

    Returns the input plus ``session_id`` (1-based per key, deterministic:
    events ordered by (ts, event_id) within key).
    """
    w = Window.partitionBy(key).orderBy(ts, "event_id")
    gap_s = float(gap_minutes * 60)
    # fractional-second gap: cast(timestamp as double) keeps microsecond
    # precision; unix_timestamp() would truncate to whole seconds and
    # mis-classify gaps within 1s of the threshold. The intermediate
    # cast("timestamp") is a no-op for LTZ input but makes the double
    # cast legal when the caller hands us TIMESTAMP_NTZ (Spark forbids
    # NTZ->double directly; LTZ->double is defined as epoch seconds).
    ts_s = F.col(ts).cast("timestamp").cast("double")
    prev_ts = F.lag(ts_s).over(w)
    new_session = (prev_ts.isNull() | ((ts_s - prev_ts) > gap_s)).cast("long")
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    the same key and right_ts <= left_ts.

    Spark has no native ASOF JOIN; the scalable formulation is a tagged
    union + ordered window carry-forward (single shuffle on the key, no
    O(n*m) pair blowup — this is the plan that survives 100 TB, unlike
    join+max-filter which re-joins the fact table twice).

    Right rows sort BEFORE left rows at equal timestamps (tag ordering)
    so ties are visible to the left row, matching ``ON l.ts >= r.ts``.

    The window order ends with the right payload struct itself, making
    it TOTAL across right rows that tie on (key, ts): without that, the
    carried payload for a tied timestamp depends on partition-internal
    row order — invisible on this testdata (nanosecond timestamps never
    collide) but nondeterministic under retries/partitionings at scale,
    the exact failure class the bucket/MG partition-invariance pins
    guard elsewhere.  Tie semantics: the GREATEST payload struct
    (field-lexicographic) among right rows at the matched timestamp.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast(
            right.select(F.struct(*right_payload).alias("s")).schema["s"].dataType
        ).alias("__right"),
    )
    r_tagged = right.select(
        F.col(key).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__left"),
        F.struct(*right_payload).alias("__right"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = Window.partitionBy("__key").orderBy(
        "__ts", "__tag", "__right"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = unioned.withColumn(
        "__last_right", F.last("__right", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__tag") == 1).select(
        F.col("__left.*"),
        *[F.col(f"__last_right.{c}").alias(f"r_{c}") for c in right_payload],
    )
    return out
