import glob, json, os, sys
from collections import defaultdict

EVDIR = "/root/repo/.scratch/eventlog"
paths = []
for root, dirs, files in os.walk(EVDIR):
    for f in files:
        if "appstatus" in f or f.startswith("."):
            continue
        paths.append(os.path.join(root, f))
stage_name, stage_tasks = {}, defaultdict(lambda: defaultdict(float))
for path in paths:
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_name[si["Stage ID"]] = (
                    si.get("Stage Name", "?"), si.get("Number of Tasks", 0),
                    (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000.0)
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]; tm = ev.get("Task Metrics") or {}
                a = stage_tasks[sid]
                a["run_s"] += tm.get("Executor Run Time", 0) / 1000.0
                a["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                a["gc_s"] += tm.get("JVM GC Time", 0) / 1000.0
                a["mem_spill"] += tm.get("Memory Bytes Spilled", 0)
                a["disk_spill"] += tm.get("Disk Bytes Spilled", 0)
                a["peak_mem"] = max(a["peak_mem"], tm.get("Peak Execution Memory", 0))
                srm = tm.get("Shuffle Read Metrics") or {}
                a["shuf_read"] += srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                a["shuf_write"] += swm.get("Shuffle Bytes Written", 0)
                inm = tm.get("Input Metrics") or {}
                a["input"] += inm.get("Bytes Read", 0)
rows = []
for sid, (nm, nt, wall) in stage_name.items():
    a = stage_tasks[sid]
    rows.append((sid, round(wall,1), round(a["run_s"],1), round(a["cpu_s"],1),
                 round(a["gc_s"],1), round(a["mem_spill"]/2**30,2),
                 round(a["disk_spill"]/2**30,2), round(a["shuf_read"]/2**30,2),
                 round(a["shuf_write"]/2**30,2), round(a["input"]/2**30,2),
                 round(a["peak_mem"]/2**30,2), nt, nm.split("\n")[0][:70]))
rows.sort(key=lambda r: -r[2])
print("sid\twall\trun_s\tcpu_s\tgc_s\tmspillG\tdspillG\tsh_rG\tsh_wG\tinG\tpeakG\tnt\tname")
for r in rows[:22]:
    print("\t".join(map(str, r)))
print("TOTAL run_s", round(sum(r[2] for r in rows),1),
      "cpu_s", round(sum(r[3] for r in rows),1),
      "gc_s", round(sum(r[4] for r in rows),1),
      "mem_spill_gb", round(sum(r[5] for r in rows),2),
      "disk_spill_gb", round(sum(r[6] for r in rows),2),
      "shuf_w_gb", round(sum(r[8] for r in rows),2))
