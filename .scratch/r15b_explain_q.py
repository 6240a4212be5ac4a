"""Capture .explain('formatted') for neardup_clusters into plans/r15/."""
import sys

sys.path.insert(0, "/root/repo")
out_path = sys.argv[1]
qname = sys.argv[2] if len(sys.argv) > 2 else "neardup_clusters"

from etl_data_pipeline_spark.session import get_spark
from etl_data_pipeline_spark.plans import QUERIES, load_all_plans

spark = get_spark("r15b-explain")
spark.sparkContext.setLogLevel("ERROR")
load_all_plans()
df = QUERIES[qname](spark, "/root/testdata/sf0.1")
plan = df._sc._jvm.PythonSQLUtils.explainString(
    df._jdf.queryExecution(), "formatted"
)
with open(out_path, "w") as f:
    f.write(plan)
print("wrote", out_path, len(plan), "chars")
spark.stop()
