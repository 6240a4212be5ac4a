"""A/B: materialize() the LSH candidate pair set inside
lsh_candidate_pairs (skinny (a,b) longs — output-sized, scale-safe) so
exact_jaccard_on_pairs' two consumers (inter join, left join) and any
extra consumer (minhash_est_quality's signature-compare leg) stop
re-running the band self-join + distinct.

Monkeypatches the operator for the variant half of each interleaved
round; asserts identical rows first.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import etl_data_pipeline_spark.operators.text as T
from etl_data_pipeline_spark.materialize import materialize
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans
from etl_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.1"
load_all_plans()
spark = get_spark(app_name="lshcand-ab")
spark.sparkContext.setLogLevel("ERROR")

_orig = T.lsh_candidate_pairs


def _mat(*a, **kw):
    return materialize(_orig(*a, **kw))


QUERY_NAMES = ["i4b_minhash_lsh", "minhash_est_quality"]

for qn in QUERY_NAMES:
    T.lsh_candidate_pairs = _orig
    # plans/text.py imported the symbol by name? check: use module attr
    import etl_data_pipeline_spark.plans.text as PT
    import etl_data_pipeline_spark.plans.incremental  # noqa

    has_name = hasattr(PT, "lsh_candidate_pairs")
    rows_cur = sorted(map(tuple, QUERIES[qn](spark, SF).collect()))
    T.lsh_candidate_pairs = _mat
    if has_name:
        PT.lsh_candidate_pairs = _mat
    rows_var = sorted(map(tuple, QUERIES[qn](spark, SF).collect()))
    assert rows_cur == rows_var, (qn, len(rows_cur), len(rows_var))
    print(f"{qn} IDENTICAL: {len(rows_cur)} rows", flush=True)

    for rnd in range(4):
        for name, fn_impl in [("current", _orig), ("variant", _mat)]:
            T.lsh_candidate_pairs = fn_impl
            if has_name:
                PT.lsh_candidate_pairs = fn_impl
            spark.catalog.clearCache()
            t0 = time.monotonic()
            QUERIES[qn](spark, SF).collect()
            print(f"{qn} round {rnd} {name}: {time.monotonic()-t0:.2f}s",
                  flush=True)
spark.stop()
