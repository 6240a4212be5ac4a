import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, duckdb
con = duckdb.connect()
df = con.sql("SELECT vec_id, embedding FROM '/root/repo/.scratch/sf10/embeddings.parquet' ORDER BY vec_id").fetchnumpy()
ids = df["vec_id"].astype("int64")
E = np.stack([np.asarray(e, dtype="float64") for e in df["embedding"]])
G = np.floor(E * 1e6).astype("int64")
n = len(ids); nlist = max(4, n // 125); stride = max(n // nlist, 1)
print("n", n, "nlist", nlist, "stride", stride, flush=True)
seed_rows = [j * stride for j in range(nlist) if j * stride < n]
cells = ids[seed_rows].copy(); C = G[seed_rows].copy()
t0 = time.time()
assign = np.empty(n, dtype="int64")
for t in range(1, 4):
    cs = np.argsort(cells); cells, C = cells[cs], C[cs]
    for lo in range(0, n, 4000):
        hi = min(lo + 4000, n)
        d = ((G[lo:hi, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign[lo:hi] = d.argmin(axis=1)
    if t < 3:
        newC, newcells = [], []
        for ci in range(len(cells)):
            m = assign == ci
            if m.any():
                newC.append(np.floor_divide(G[m].sum(axis=0), m.sum()))
                newcells.append(cells[ci])
        C, cells = np.array(newC), np.array(newcells)
    print("iter", t, "cells", len(cells), f"{time.time()-t0:.0f}s", flush=True)
sizes = np.bincount(assign, minlength=len(cells))
sizes = sizes[sizes > 0]
print("final nonempty", len(sizes), "max", sizes.max(),
      "p99", float(np.percentile(sizes, 99)), "mean", float(sizes.mean()),
      "probed-scan-frac", float(np.sort(sizes)[-max(2, len(sizes)//5):].sum())/n)
