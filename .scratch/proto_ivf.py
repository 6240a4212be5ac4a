import sys, numpy as np, duckdb

def load(path):
    con = duckdb.connect()
    df = con.sql(f"SELECT vec_id, embedding FROM '{path}/embeddings.parquet' ORDER BY vec_id").fetchnumpy()
    ids = df["vec_id"].astype("int64")
    E = np.stack([np.asarray(e, dtype="float64") for e in df["embedding"]])
    return ids, E

def exact_top3(ids, E):
    # all-pairs cosine rounded 6, tie neighbor asc
    N = E / np.linalg.norm(E, axis=1, keepdims=True)
    C = np.round(N @ N.T, 6)
    np.fill_diagonal(C, -np.inf)
    out = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, -C[i]))[:3]
        out[ids[i]] = set(ids[order])
    return out

def ivf(ids, E, iters, nlist=None, nprobe=None):
    n = len(ids)
    G = np.floor(E * 1e6).astype("int64")
    if nlist is None: nlist = max(4, n // 125)
    if nprobe is None: nprobe = max(2, nlist // 5)
    stride = n // nlist
    order = np.argsort(ids)
    seed_rows = [order[j*stride] for j in range(nlist)]
    cells = ids[seed_rows].copy()          # cell id = seed vec_id
    C = G[seed_rows].copy()                # integer centroids
    for t in range(1, iters+1):
        # dist: n x nlist exact int
        D = ((G[:, None, :] - C[None, :, :])**2).sum(axis=2)
        # argmin tie-break by cell id asc: cells sorted? sort columns by cell id
        cs = np.argsort(cells)
        D = D[:, cs]; cells = cells[cs]; C = C[cs]
        assign = D.argmin(axis=1)  # first occurrence = lowest cell id ties
        if t < iters:
            newC, newcells = [], []
            for ci in range(len(cells)):
                m = assign == ci
                if m.sum() == 0: continue
                s = G[m].sum(axis=0)
                newC.append(np.floor_divide(s, m.sum()))
                newcells.append(cells[ci])
            C = np.array(newC); cells = np.array(newcells)
    # probes: top nprobe cells per vector by (d, cell asc)
    rank = np.lexsort((np.broadcast_to(cells, D.shape), D), axis=1)  # hmm lexsort per row
    # simpler: cells already ascending; argsort stable on D
    probe_idx = np.argsort(D, axis=1, kind="stable")[:, :nprobe]
    members = {}  # cell -> ids
    for ci in range(len(cells)):
        members[ci] = ids[assign == ci]
    N = E / np.linalg.norm(E, axis=1, keepdims=True)
    hits = 0; total = 0
    exact = exact_top3(ids, E)
    sizes = [ (assign==ci).sum() for ci in range(len(cells)) ]
    for i in range(len(ids)):
        cand = np.concatenate([members[ci] for ci in probe_idx[i]])
        cand = cand[cand != ids[i]]
        if len(cand) == 0: continue
        idx = np.searchsorted(ids, cand)  # ids sorted? ensure
        cos = np.round(N[i] @ N[idx].T, 6)
        o = np.lexsort((cand, -cos))[:3]
        top = set(cand[o])
        hits += len(top & exact[ids[i]]); total += 3
    scan = D.shape[1] and np.mean([sum(sizes[ci] for ci in probe_idx[i]) for i in range(len(ids))])/len(ids)
    return nlist, nprobe, hits/total, np.mean([sum(sizes[ci] for ci in probe_idx[i]) for i in range(len(ids))])/len(ids), len(cells)

for path in sys.argv[1:]:
    ids, E = load(path)
    assert (np.diff(ids) > 0).all()
    for iters in (1,2,3,4):
        nlist, nprobe, rec, scanfrac, ncells = ivf(ids, E, iters)
        print(f"{path} n={len(ids)} iters={iters} nlist={nlist} nprobe={nprobe} cells_nonempty={ncells} recall@3={rec:.3f} scan_frac={scanfrac:.3f}")
