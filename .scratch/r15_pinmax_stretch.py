"""Round-14 stretch (VERDICT r13 item 8): a TRUE above-PIN_MAX_CELLS
flat build in AUTO mode — nlist just over 1e5 so the auto ladder's
non-pin path engages for real, not via forced tiny chunks.

n = 12.6M dense 8-d vectors -> adaptive nlist = 100,800 > PIN_MAX
(1e5); auto resolves PIPELINED (<= PIPE_MAX 262,144): 2 chunks
broadcast up front, one kernel pass per iteration, no merge shuffle.
Records build wall time per phase (gen / 3-iteration build+assign).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = Path("/root/repo/.scratch/pinmax")
N, DIM = 12_600_000, 8
if not (OUT / "embeddings.parquet").exists():
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(41)
    t0 = time.monotonic()
    v = rng.standard_normal((N, DIM)).astype(np.float32)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(N), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(v.reshape(-1)), DIM
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(np.zeros(N, np.int32)),
        }),
        OUT / "embeddings.parquet",
        # 100k-row groups -> ~126 balanced scan partitions; the first
        # attempt's pandas-default ~1M-row groups left 20 of 32 cores
        # idle behind 12 fat tasks
        row_group_size=100_000,
    )
    print(f"gen: {N} x {DIM} in {time.monotonic()-t0:.0f}s", flush=True)

from etl_data_pipeline_spark.operators.ann_adaptive import (
    PIN_MAX_CELLS,
    adaptive_nlist,
    _resolve_assign_mode,
    kmeans_cell_ranks,
)
from etl_data_pipeline_spark.session import get_spark

spark = get_spark(app_name="pinmax-stretch")
spark.sparkContext.setLogLevel("ERROR")
e = spark.read.parquet(str(OUT / "embeddings.parquet"))
nlist = adaptive_nlist(N)
mode = _resolve_assign_mode("auto", nlist)
nchunks = -(-nlist // 65536)
print(f"n={N} nlist={nlist} (> PIN_MAX {PIN_MAX_CELLS}) auto mode={mode} "
      f"nchunks={nchunks}", flush=True)
assert nlist > PIN_MAX_CELLS and mode != "pin"
t0 = time.monotonic()
cnt = (
    kmeans_cell_ranks(e, nlist=nlist, iters=1, top=1)
    .select("vec_id").count()
)
secs = time.monotonic() - t0
print(f"BUILD(iters=1 -- one full assignment pass; a production 3-iter build = ~3x this): {cnt} assignments in {secs:.0f}s (mode={mode})", flush=True)
