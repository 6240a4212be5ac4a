"""Splice the near-dup GRAPH-family sf1 mirrors into tools/sf1_parity.py
(VERDICT r12 item 4: the family reuses the verified i4b pair mirror;
all six queries are pure graph algorithms over that edge set)."""

NEW = '''

def _mirror_graphs(sf_dir: str):
    """Pure-Python mirrors of the six near-dup GRAPH queries — all
    built on the SAME verified LSH pair set as i4b (_mirror_minhash),
    so the quadratic term lives only in the upstream candidate
    generator the engine also uses, never here.  Exact-path only:
    component ids, integer-grid pagerank (the one float op mirrored
    expression-for-expression), integer jaccard grids.

    Returns {query_name: canonical comparable}."""
    import math

    con = duckdb.connect()
    doc_ids = [
        r[0] for r in con.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    edges = sorted((a, b) for a, b, _j in _mirror_minhash(sf_dir))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    out: dict = {}

    # neardup_clusters: component = min reachable over ALL doc nodes
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for d in doc_ids:
        parent[d] = d
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for d in doc_ids:
        r = find(d)
        comp_min[r] = min(comp_min.get(r, d), d)
    out["neardup_clusters"] = {
        (d, comp_min[find(d)], comp_min[find(d)] == d) for d in doc_ids
    }

    # degree histogram (nodes with >= 1 edge)
    deg = {u: len(vs) for u, vs in adj.items()}
    hist: dict[int, int] = {}
    for dv in deg.values():
        hist[dv] = hist.get(dv, 0) + 1
    out["neardup_degree_hist"] = {(d, n) for d, n in hist.items()}

    # triangles / wedges / clustering coefficient
    fwd: dict[int, set] = {}
    for a, b in edges:
        fwd.setdefault(a, set()).add(b)
    tri = sum(
        len(fwd.get(a, set()) & fwd.get(b, set())) for a, b in edges
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    out["neardup_triangles"] = (tri, wedges, 3.0 * tri / wedges)

    # kcore_peel: 3 rounds of remove-degree-<3
    nodes = set(deg)
    cur = {(u, v) for u, v in edges} | {(v, u) for u, v in edges}
    survivors = []
    last_deg: dict[int, int] = {}
    for _ in range(3):
        dcnt: dict[int, int] = {}
        for u, _v in cur:
            dcnt[u] = dcnt.get(u, 0) + 1
        nodes = {u for u, dv in dcnt.items() if dv >= 3}
        survivors.append(set(nodes))
        cur = {(u, v) for u, v in cur if u in nodes and v in nodes}
        last_deg = dcnt
    converged = len(survivors[2]) == len(survivors[1])
    out["kcore_peel"] = {
        (u, last_deg[u], converged) for u in survivors[2]
    }

    # pagerank (3 iterations, 1e-12 integer grid, floor per edge)
    n_nodes = len(deg)
    g = {u: math.floor(1000000000000.0 / n_nodes) for u in deg}
    base = math.floor(150000000000.0 / n_nodes)
    for _ in range(3):
        nxt = {u: base for u in deg}
        for u, vs in adj.items():
            c = math.floor(0.85 * g[u] / deg[u])
            for v in vs:
                nxt[v] += c
        g = nxt
    out["pagerank_neardup"] = {
        (u, round(gv / 1000000000000.0, 6)) for u, gv in g.items()
    }

    # link prediction: top-20 two-hop non-edges by neighborhood jaccard
    eset = set(edges)
    cand: dict[tuple, int] = {}
    for w, vs in adj.items():
        vs_sorted = sorted(vs)
        for i, u in enumerate(vs_sorted):
            for v in vs_sorted[i + 1:]:
                cand[(u, v)] = cand.get((u, v), 0) + 1
    scored = [
        (u, v, c, (c * 1000000) // (deg[u] + deg[v] - c))
        for (u, v), c in cand.items()
        if (u, v) not in eset
    ]
    scored.sort(key=lambda t: (-t[3], -t[2], t[0], t[1]))
    out["neardup_link_predict"] = scored[:20]
    return out
'''

WIRING = '''
    graph_names = {"neardup_clusters", "neardup_degree_hist",
                   "neardup_triangles", "kcore_peel",
                   "pagerank_neardup", "neardup_link_predict"}
    if names is None or (graph_names & names):
        t0 = time.monotonic()
        gw = _mirror_graphs(sf_dir)
        gprep = time.monotonic() - t0

    if want("neardup_clusters"):
        t0 = time.monotonic()
        got = {
            (r["doc_id"], r["component"], r["is_canonical"])
            for r in qs["neardup_clusters"](spark, sf_dir).collect()
        }
        spark.catalog.clearCache()
        record("neardup_clusters", got == gw["neardup_clusters"],
               len(got), gprep + time.monotonic() - t0)

    if want("neardup_degree_hist"):
        t0 = time.monotonic()
        got = {
            (r["degree"], r["n_nodes"])
            for r in qs["neardup_degree_hist"](spark, sf_dir).collect()
        }
        spark.catalog.clearCache()
        record("neardup_degree_hist", got == gw["neardup_degree_hist"],
               len(got), time.monotonic() - t0)

    if want("neardup_triangles"):
        t0 = time.monotonic()
        r = qs["neardup_triangles"](spark, sf_dir).collect()[0]
        spark.catalog.clearCache()
        got = (r["n_triangles"], r["n_wedges"], r["clustering_coeff"])
        record("neardup_triangles", got == gw["neardup_triangles"], 1,
               time.monotonic() - t0,
               detail=f"tri={got[0]} wedges={got[1]}")

    if want("kcore_peel"):
        t0 = time.monotonic()
        got = {
            (r["doc_id"], r["degree"], r["converged"])
            for r in qs["kcore_peel"](spark, sf_dir).collect()
        }
        spark.catalog.clearCache()
        record("kcore_peel", got == gw["kcore_peel"], len(got),
               time.monotonic() - t0)

    if want("pagerank_neardup"):
        t0 = time.monotonic()
        got = {
            (r["doc_id"], r["pagerank"])
            for r in qs["pagerank_neardup"](spark, sf_dir).collect()
        }
        spark.catalog.clearCache()
        record("pagerank_neardup", got == gw["pagerank_neardup"],
               len(got), time.monotonic() - t0)

    if want("neardup_link_predict"):
        t0 = time.monotonic()
        got = [
            (r["u"], r["v"], r["common"], r["jaccard_grid"])
            for r in qs["neardup_link_predict"](spark, sf_dir).collect()
        ]
        spark.catalog.clearCache()
        record("neardup_link_predict",
               got == gw["neardup_link_predict"], len(got),
               time.monotonic() - t0)

'''

p = "tools/sf1_parity.py"
s = open(p).read()
anchor = "def run_mirrors(spark, qs, sf_dir: str, results: dict,"
assert anchor in s
s = s.replace(anchor, NEW + "\n\n" + anchor, 1)
tail = "    return fails\n\n\ndef main("
assert tail in s
s = s.replace(tail, WIRING + "    return fails\n\n\ndef main(", 1)

repl = {
    '"neardup_clusters": "components over the all-pairs near-dup graph",':
        '"neardup_clusters": "components over the near-dup graph '
        '(quadratic oracle) — mirror-checked",',
    '"neardup_degree_hist": "degree histogram over the all-pairs graph",':
        '"neardup_degree_hist": "degree histogram over the near-dup '
        'graph (quadratic oracle) — mirror-checked",',
    '"neardup_triangles": "triangle count over the all-pairs graph",':
        '"neardup_triangles": "triangle count over the near-dup graph '
        '(quadratic oracle) — mirror-checked",',
    '"neardup_link_predict": "link prediction over the all-pairs graph",':
        '"neardup_link_predict": "link prediction over the near-dup '
        'graph (quadratic oracle) — mirror-checked",',
    '"pagerank_neardup": "pagerank over the all-pairs near-dup graph",':
        '"pagerank_neardup": "pagerank over the near-dup graph '
        '(quadratic oracle) — mirror-checked",',
    '"kcore_peel": "k-core peel over the all-pairs near-dup graph",':
        '"kcore_peel": "k-core peel over the near-dup graph (quadratic '
        'oracle) — mirror-checked",',
}
for old, new in repl.items():
    assert old in s, old
    s = s.replace(old, new, 1)
open(p, "w").write(s)
import ast
ast.parse(s)
print("graph mirrors spliced")
