"""Probe 2: does reliable df.checkpoint(eager=True) fill Observation?"""
import sys, tempfile, threading

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, Observation
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .appName("observe-probe2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
ckpt = tempfile.mkdtemp(prefix="obsprobe_ckpt_")
spark.sparkContext.setCheckpointDir(ckpt)

df = spark.range(1000).select(
    (F.col("id") % 97).alias("u"), (F.col("id") % 89).alias("v")
)
obs = Observation("sig")
d2 = df.observe(obs, F.count(F.lit(1)).alias("c"),
                F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"))
d3 = d2.checkpoint(eager=True)
got = {}
def grab():
    got.update(obs.get)
t = threading.Thread(target=grab, daemon=True)
t.start()
t.join(timeout=10)
print("reliable checkpoint fills observation:", got if got else "NO (timeout)")
print("rows after checkpoint:", d3.count())
spark.stop()
