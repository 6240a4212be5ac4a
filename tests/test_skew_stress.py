"""Adversarial-skew stress for the LSH/dedup path (VERDICT r6 item 8).

The bucket cap's partition-invariance is pinned elsewhere; what was
never exercised is a PATHOLOGICAL corpus — every document identical —
where without the cap every band key collapses into ONE bucket and the
band self-join goes quadratic (n^2/2 pairs).  These tests prove, at
sf0.01-scale document counts (500 docs -> 124,750 uncapped pairs):

  - the cap keeps the candidate-pair count at ZERO on the adversarial
    corpus (one bucket of 500 > LSH_MAX_BUCKET_SIZE=100, diverted
    whole), while the divert dashboard's oversized flag reports exactly
    where those documents went — nothing is silently lost;
  - a mixed corpus (big boilerplate cluster + genuine near-dup pairs)
    still finds the genuine pairs, bit-identically across partitioning
    regimes (1, 3, and 17 input partitions);
  - the end-to-end cluster path (pairs -> connected components) stays
    bounded and stable on the adversarial corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_data_pipeline_spark.operators.text import (
    LSH_MAX_BUCKET_SIZE,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_lsh_pairs,
)

N_DOCS = 500  # sf0.01's documents row count


def _identical_corpus(spark, n=N_DOCS):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate template text repeated everywhere")
        .alias("text"),
    )


def _mixed_corpus(spark, n_boiler=N_DOCS - 6):
    boiler = _identical_corpus(spark, n_boiler)
    genuine = spark.createDataFrame(
        [
            # three near-dup pairs, ids above the boilerplate range
            (9001, "alpha beta gamma delta epsilon zeta eta theta"),
            (9002, "alpha beta gamma delta epsilon zeta eta iota"),
            (9011, "one two three four five six seven eight"),
            (9012, "one two three four five six seven nine"),
            (9021, "red orange yellow green blue indigo violet ultra"),
            (9022, "red orange yellow green blue indigo violet infra"),
        ],
        "doc_id long, text string",
    )
    return boiler.unionByName(genuine)


def test_identical_corpus_pairs_bounded_by_cap(spark):
    docs = _identical_corpus(spark)
    # uncapped this would be n*(n-1)/2 = 124,750 pairs; the single
    # oversized bucket (size 500 > cap) is diverted whole -> 0 pairs
    n_cand = lsh_candidate_pairs(docs).count()
    assert n_cand == 0
    assert minhash_lsh_pairs(docs, threshold=0.5).count() == 0


def test_identical_corpus_divert_dashboard_accounts_for_all_docs(spark):
    docs = _identical_corpus(spark)
    bands = minhash_bands(docs)  # (doc_id, band, band_key), 4 bands
    stats = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .withColumn(
            "oversized", F.col("bucket_size") > F.lit(LSH_MAX_BUCKET_SIZE)
        )
    )
    rows = stats.collect()
    # all docs identical -> exactly one bucket per band, every one
    # oversized and flagged: the divert is visible, not silent
    assert len(rows) == 4
    assert all(r["oversized"] and r["bucket_size"] == N_DOCS for r in rows)


@pytest.mark.parametrize("n_parts", [1, 3, 17])
def test_mixed_corpus_finds_genuine_pairs_under_any_partitioning(
    spark, n_parts
):
    docs = _mixed_corpus(spark).repartition(n_parts)
    got = sorted(
        (r["a"], r["b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    )
    # the boilerplate mega-bucket is diverted; the genuine near-dup
    # pairs survive, identically at every input partitioning
    assert got == [(9001, 9002), (9011, 9012), (9021, 9022)]


def test_exact_jaccard_df_cap_diverts_boilerplate_both_grains(spark):
    """The EXACT verifier's df-cap (jaccard_pairs max_df_frac), both
    shingle grains: on the all-identical corpus every shingle's df is
    100% of the block, so the cap empties every doc's set — 0 pairs
    where the uncapped join would be n^2/2 = 124,750 all at jaccard
    1.0."""
    from etl_data_pipeline_spark.operators.text import jaccard_pairs

    docs = _identical_corpus(spark).withColumn("lang", F.lit("x"))
    for n in (1, 2):
        got = jaccard_pairs(
            docs, threshold=0.5, max_df_frac=0.2, shingle_n=n
        )
        assert got.count() == 0, f"shingle_n={n}"


@pytest.mark.parametrize("n_parts", [1, 3, 17])
def test_exact_bigram_jaccard_mixed_corpus_any_partitioning(spark, n_parts):
    """Genuine near-dups survive the bigram df-cap (their shingles are
    rare), the boilerplate cluster is diverted whole, and the result is
    identical at every input partitioning.  Each genuine pair differs
    in its last word only: 7 bigrams per doc, 6 shared, union 8 ->
    jaccard 0.75 exactly."""
    from etl_data_pipeline_spark.operators.text import jaccard_pairs

    docs = (
        _mixed_corpus(spark)
        .withColumn("lang", F.lit("x"))
        .repartition(n_parts)
    )
    rows = jaccard_pairs(
        docs, threshold=0.5, max_df_frac=0.2, shingle_n=2
    ).collect()
    got = sorted((r["a"], r["b"], r["jaccard"]) for r in rows)
    assert got == [
        (9001, 9002, 0.75),
        (9011, 9012, 0.75),
        (9021, 9022, 0.75),
    ]


def test_identical_corpus_components_stay_bounded(spark):
    from etl_data_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    docs = _identical_corpus(spark)
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    edges = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    assignments, rounds = connected_components_star(edges)
    # no edges -> no assignments, loop exits promptly
    assert assignments.count() == 0
    assert rounds <= 2
