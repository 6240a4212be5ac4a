"""Property-based algebraic invariants (SURVEY.md §5.3, hypothesis).

Small random frames -> invariants that must hold for ANY input:
filter-split equivalence, inner-join commutativity, dedup idempotence,
window rank is a permutation within its partition, union-all count
additivity. Examples are kept small (Spark job per example); the point
is input-shape coverage, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key
        st.integers(min_value=-100, max_value=100),     # val
        st.sampled_from(["x", "y", "z"]),               # tag
    ),
    min_size=1,
    max_size=30,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "key int, val int, tag string")


@SLOW
@given(rows=ROWS)
def test_filter_split_equivalence(spark, rows):
    # filter(a AND b) == filter(a).filter(b) — the rewrite predicate
    # pushdown relies on
    df = _df(spark, rows)
    both = df.filter((F.col("val") > 0) & (F.col("tag") != "y")).count()
    split = df.filter(F.col("val") > 0).filter(F.col("tag") != "y").count()
    assert both == split


@SLOW
@given(rows=ROWS, rows2=ROWS)
def test_inner_join_commutes(spark, rows, rows2):
    a = _df(spark, rows)
    b = _df(spark, rows2).withColumnRenamed("val", "val2").drop("tag")
    ab = a.join(b, "key").count()
    ba = b.join(a, "key").count()
    assert ab == ba


@SLOW
@given(rows=ROWS)
def test_dedup_idempotent(spark, rows):
    df = _df(spark, rows)
    once = df.distinct()
    assert once.count() == once.distinct().count()


@SLOW
@given(rows=ROWS)
def test_window_rank_is_permutation(spark, rows):
    # row_number within each partition is exactly 1..n (no gaps/dupes)
    df = _df(spark, rows)
    w = Window.partitionBy("key").orderBy("val", "tag")
    rn = df.withColumn("rn", F.row_number().over(w))
    per_key = rn.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.count_distinct("rn").alias("nd"),
    )
    bad = per_key.filter(
        (F.col("lo") != 1) | (F.col("hi") != F.col("n")) | (F.col("nd") != F.col("n"))
    ).count()
    assert bad == 0


@SLOW
@given(rows=ROWS, rows2=ROWS)
def test_union_all_count_additive(spark, rows, rows2):
    a, b = _df(spark, rows), _df(spark, rows2)
    assert a.unionByName(b).count() == a.count() + b.count()
