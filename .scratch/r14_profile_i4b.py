"""Round-14 directive 1: stage-level profile of i4b_minhash_lsh at
sf100 (5M docs) — attribute the 22.7 s (sf10) -> 787 s (sf100) slope-34.7
jump to a stage before blaming or excusing any code.

Runs the query once with spark.eventLog on, then aggregates per-stage
task metrics (run time, spill, shuffle r/w, peak exec memory) from the
event log and prints a ranked table.
"""
import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

EVDIR = "/root/repo/.scratch/eventlog"
os.makedirs(EVDIR, exist_ok=True)
for f in glob.glob(EVDIR + "/*"):
    os.remove(f)

from pyspark.sql import SparkSession
from etl_data_pipeline_spark.session import RUNTIME_CONFS

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
builder = (
    SparkSession.builder.appName("i4b-profile")
    .master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", os.environ.get("SHUF", cpus))
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    .config("spark.ui.enabled", "false")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", "file://" + EVDIR)
)
for k, v in RUNTIME_CONFS.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from etl_data_pipeline_spark.plans import QUERIES, load_all_plans

load_all_plans()
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf100"
name = sys.argv[2] if len(sys.argv) > 2 else "i4b_minhash_lsh"
t0 = time.monotonic()
n = QUERIES[name](spark, sf).count()
secs = time.monotonic() - t0
print(f"RESULT {name}: {n} rows {secs:.1f}s", flush=True)
spark.stop()

# -- aggregate the event log ------------------------------------------------
stage_name = {}
stage_tasks = defaultdict(lambda: defaultdict(float))
for path in glob.glob(EVDIR + "/*"):
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                stage_name[sid] = (
                    si.get("Stage Name", "?"),
                    si.get("Number of Tasks", 0),
                    (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                    / 1000.0,
                )
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                agg = stage_tasks[sid]
                agg["run_s"] += tm.get("Executor Run Time", 0) / 1000.0
                agg["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                agg["gc_s"] += tm.get("JVM GC Time", 0) / 1000.0
                agg["mem_spill"] += tm.get("Memory Bytes Spilled", 0)
                agg["disk_spill"] += tm.get("Disk Bytes Spilled", 0)
                agg["peak_mem"] = max(
                    agg["peak_mem"], tm.get("Peak Execution Memory", 0)
                )
                srm = tm.get("Shuffle Read Metrics") or {}
                agg["shuf_read"] += srm.get("Local Bytes Read", 0) + srm.get(
                    "Remote Bytes Read", 0
                )
                agg["shuf_read_disk"] += srm.get("Remote Bytes Read To Disk", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                agg["shuf_write"] += swm.get("Shuffle Bytes Written", 0)
                inm = tm.get("Input Metrics") or {}
                agg["input"] += inm.get("Bytes Read", 0)

rows = []
for sid, (nm, ntasks, wall) in stage_name.items():
    a = stage_tasks[sid]
    rows.append(
        dict(
            stage=sid,
            wall_s=round(wall, 1),
            run_s=round(a["run_s"], 1),
            gc_s=round(a["gc_s"], 1),
            mem_spill_gb=round(a["mem_spill"] / 2**30, 2),
            disk_spill_gb=round(a["disk_spill"] / 2**30, 2),
            shuf_r_gb=round(a["shuf_read"] / 2**30, 2),
            shuf_w_gb=round(a["shuf_write"] / 2**30, 2),
            input_gb=round(a["input"] / 2**30, 2),
            peak_mem_gb=round(a["peak_mem"] / 2**30, 2),
            ntasks=ntasks,
            name=nm.split("\n")[0][:80],
        )
    )
rows.sort(key=lambda r: -r["run_s"])
hdr = ["stage", "wall_s", "run_s", "gc_s", "mem_spill_gb", "disk_spill_gb",
       "shuf_r_gb", "shuf_w_gb", "input_gb", "peak_mem_gb", "ntasks", "name"]
print("\t".join(hdr))
for r in rows:
    print("\t".join(str(r[h]) for h in hdr))
tot = dict(
    run_s=round(sum(r["run_s"] for r in rows), 1),
    mem_spill_gb=round(sum(r["mem_spill_gb"] for r in rows), 2),
    disk_spill_gb=round(sum(r["disk_spill_gb"] for r in rows), 2),
    shuf_w_gb=round(sum(r["shuf_w_gb"] for r in rows), 2),
)
print("TOTALS", json.dumps(tot))
print(json.dumps({"query": name, "sf": sf, "rows": n, "secs": round(secs, 1)}))
