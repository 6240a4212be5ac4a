"""Splice the round-13 mirror additions into tools/sf1_parity.py:
- _mirror_pretrain (directive 3: the flagship DAG at sf1)
- exact-kNN pair helper + recall-gate mirrors (directive 4: ivf_recall,
  ivf2_recall, ann_recall, ann_multiprobe_recall, pq_recall)
- _mirror_pq (pq_ann) and _mirror_i6c (i6c_quantized_rerank)
and remove the drained names from SKIP.
"""

NEW_FUNCS = '''

def _load_emb(sf_dir: str):
    """(ids int64 ascending, E float64 matrix) for the mirror family."""
    import numpy as np

    con = duckdb.connect()
    df = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchnumpy()
    ids = df["vec_id"].astype("int64")
    E = np.stack([np.asarray(e, dtype="float64") for e in df["embedding"]])
    return ids, E


def _exact3_pairs(ids, E, k: int = 3):
    """Exact top-k neighbor PAIR SET {(q, n)} by (rounded-6 cos desc,
    id asc) — the exact leg every recall gate shares.  Row-chunked
    matmuls (1000 x n), never the full n^2 matrix."""
    import numpy as np

    N = E / np.linalg.norm(E, axis=1, keepdims=True)
    n = len(ids)
    pairs = set()
    for lo in range(0, n, 1000):
        hi = min(lo + 1000, n)
        C = np.round(N[lo:hi] @ N.T, 6)
        for r in range(hi - lo):
            C[r, lo + r] = -np.inf  # mask self
            o = np.lexsort((ids, -C[r]))[:k]
            q = int(ids[lo + r])
            for j in o:
                pairs.add((q, int(ids[j])))
    return pairs


def _recall_row(exact_pairs, approx_pairs):
    """(n_exact, n_hit, recall) with the engines' exact float division."""
    n_exact = len(exact_pairs)
    n_hit = len(exact_pairs & approx_pairs)
    return n_exact, n_hit, n_hit / n_exact


def _mirror_lsh_single(sf_dir: str, k: int = 3):
    """numpy mirror of SINGLE-probe LSH top-k (ann_lsh semantics:
    adaptive planes, md5-integer projections, in-bucket rounded-6
    cosine, (cos desc, id) ties) — _mirror_multiprobe without the
    Hamming shell; used by the ann_recall gate mirror."""
    import hashlib

    import numpy as np

    from etl_data_pipeline_spark.operators.ann_adaptive import (
        adaptive_planes,
    )

    ids, E = _load_emb(sf_dir)
    n, planes = len(ids), adaptive_planes(len(ids))
    m = np.abs(E).max(axis=1)
    scale = np.where(m == 0, 1.0, m)
    q = np.floor(E * 127.0 / scale[:, None] + 0.5)
    w = np.array([
        [int(hashlib.md5(f"{j}_{p}".encode()).hexdigest()[:8], 16)
         % 2001 - 1000 for p in range(64)]
        for j in range(planes)
    ], dtype="float64")
    bucket = (((q @ w.T) > 0) << np.arange(planes)).sum(axis=1).astype(
        "int64"
    )
    N = E / np.linalg.norm(E, axis=1, keepdims=True)
    pairs = set()
    for b in np.unique(bucket):
        rows = np.nonzero(bucket == b)[0]
        if len(rows) < 2:
            continue
        C = np.round(N[rows] @ N[rows].T, 6)
        for r in range(len(rows)):
            C[r, r] = -np.inf
            o = np.lexsort((ids[rows], -C[r]))[:k]
            o = [j for j in o if C[r, j] > -np.inf]
            for j in o:
                pairs.add((int(ids[rows[r]]), int(ids[rows[j]])))
    return pairs


def _mirror_pq(sf_dir: str, k: int = 3, n_cand: int = 50):
    """numpy mirror of the FULL scale-adaptive PQ retrieval
    (operators/ann_adaptive.py::pq_rerank_adaptive): int8 quantize,
    n_codes = max(16, n/125) seed codebook (lowest vec_ids), exact
    integer subspace argmin with (dist, code) ties, decode, rounded-6
    SDC candidate top-n_cand with (qcos desc, n) ties, exact rounded-6
    float rerank to top-k."""
    import numpy as np

    ids, E = _load_emb(sf_dir)
    n = len(ids)
    n_codes = max(16, n // 125)
    m = np.abs(E).max(axis=1)
    scale = np.where(m == 0, 1.0, m)
    q8 = np.floor(E * 127.0 / scale[:, None] + 0.5)  # integer-valued
    # seeds: the n_codes LOWEST vec_ids (ids are ascending)
    cb = q8[:n_codes].reshape(n_codes, 16, 4).transpose(1, 0, 2)  # (16,nc,4)
    X = q8.reshape(n, 16, 4)
    codes = np.empty((n, 16), dtype="int64")
    for s in range(16):
        Xs, Cs = X[:, s, :], cb[s]
        ds = ((Xs * Xs).sum(1)[:, None] + (Cs * Cs).sum(1)[None, :]
              - 2.0 * (Xs @ Cs.T))
        codes[:, s] = ds.argmin(axis=1)  # first min = lowest code id
    dec = cb[np.arange(16)[None, :], codes].reshape(n, 64)
    Nd = dec / np.linalg.norm(dec, axis=1, keepdims=True)
    N = E / np.linalg.norm(E, axis=1, keepdims=True)
    out = {}
    for lo in range(0, n, 1000):
        hi = min(lo + 1000, n)
        Dq = np.round(Nd[lo:hi] @ Nd.T, 6)
        for r in range(hi - lo):
            i = lo + r
            Dq[r, i] = -np.inf
            cand = np.lexsort((ids, -Dq[r]))[:n_cand]
            cos = np.round(N[i] @ N[cand].T, 6)
            o = np.lexsort((ids[cand], -cos))[:k]
            out[int(ids[i])] = [
                (int(ids[cand][j]), float(cos[j])) for j in o
            ]
    return out


def _mirror_i6c(sf_dir: str, k: int = 3, n_cand: int = 20):
    """numpy mirror of the quantized-rerank path (i6c): int8-quantized
    rounded-6 cosine candidate top-20 per query with (qcos desc, n)
    ties, exact rounded-6 float rerank to top-3."""
    import numpy as np

    ids, E = _load_emb(sf_dir)
    n = len(ids)
    m = np.abs(E).max(axis=1)
    scale = np.where(m == 0, 1.0, m)
    q8 = np.floor(E * 127.0 / scale[:, None] + 0.5)
    Nq = q8 / np.linalg.norm(q8, axis=1, keepdims=True)
    N = E / np.linalg.norm(E, axis=1, keepdims=True)
    out = {}
    for lo in range(0, n, 1000):
        hi = min(lo + 1000, n)
        Cq = np.round(Nq[lo:hi] @ Nq.T, 6)
        for r in range(hi - lo):
            i = lo + r
            Cq[r, i] = -np.inf
            cand = np.lexsort((ids, -Cq[r]))[:n_cand]
            cos = np.round(N[i] @ N[cand].T, 6)
            o = np.lexsort((ids[cand], -cos))[:k]
            out[int(ids[i])] = [
                (int(ids[cand][j]), float(cos[j])) for j in o
            ]
    return out


def _mirror_pretrain(sf_dir: str):
    """Pure-Python mirror of the FLAGSHIP end-to-end DAG
    (plans/pipelines.py::pretrain_corpus): sha-exact dedup keep-min,
    word-trigram decontamination against the doc_id%97 eval slice,
    Knuth-hash mixture sampling, per-(lang, source) fingerprint.
    All-integer/exact-string semantics — no floats except the one
    hash/2^32 < rate comparison, mirrored bit-for-bit."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text, lang, source "
        f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    # 1. exact dedup: keep-min doc_id per exact text (sha2 keying is
    # injective on the corpus, so grouping by text is the same answer)
    seen: dict[str, int] = {}
    docs = []
    for doc_id, text, lang, source in rows:  # doc_id ascending
        if text in seen:
            continue
        seen[text] = doc_id
        docs.append((doc_id, text, lang, source))
    # 2. trigram decontamination
    tris: dict[int, set] = {}
    for doc_id, text, _l, _s in docs:
        s = text.split(" ")
        tris[doc_id] = {
            " ".join(s[i:i + 3]) for i in range(len(s) - 2)
        }
    ev: set = set()
    for doc_id, tr in tris.items():
        if doc_id % 97 == 0:
            ev |= tr
    clean = [
        (doc_id, text, lang, source)
        for doc_id, text, lang, source in docs
        if doc_id % 97 != 0 and not (tris[doc_id] & ev)
    ]
    # 3. mixture sample: u = (id * 2654435761 % 2^32) / 2^32 < rate
    rates = {"en": 0.9, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.1}
    out: dict[tuple, list] = {}
    for doc_id, text, lang, source in clean:
        u = ((doc_id * 2654435761) % 4294967296) / 4294967296.0
        if not (u < rates.get(lang, 0.05)):
            continue
        agg = out.setdefault((lang, source), [0, 0])
        agg[0] += 1
        agg[1] += len(text.split(" "))
    return {
        (lang, source, n, tot) for (lang, source), (n, tot) in out.items()
    }
'''

WIRING = '''
    # ---- round-13 additions (VERDICT r12 items 3 & 4) ----
    quality = {"ivf_recall", "ivf2_recall", "ann_recall",
               "ann_multiprobe_recall", "pq_recall"}
    if names is None or (quality & names):
        t0 = time.monotonic()
        _ids, _E = _load_emb(sf_dir)
        exact3 = _exact3_pairs(_ids, _E)
        prep_q = time.monotonic() - t0

    def check_recall(name, approx_pairs, prep_secs):
        t0 = time.monotonic()
        n_exact, n_hit, recall = _recall_row(exact3, approx_pairs)
        row = qs[name](spark, sf_dir).collect()[0]
        match = (
            row["n_exact"] == n_exact
            and row["n_hit"] == n_hit
            and row["recall"] == recall
        )
        record(name, match, 1, prep_secs + time.monotonic() - t0,
               detail=f"recall={recall:.4f}")
        spark.catalog.clearCache()

    if want("ivf_recall"):
        t0 = time.monotonic()
        ivf_pairs = {
            (q, n)
            for q, lst in _mirror_ivf(sf_dir).items()
            for (n, _c, _r) in lst
        }
        check_recall("ivf_recall", ivf_pairs, time.monotonic() - t0)

    if want("ivf2_recall"):
        t0 = time.monotonic()
        ivf2_pairs = {
            (q, n)
            for q, lst in _mirror_ivf2(sf_dir).items()
            for (n, _c, _r) in lst
        }
        check_recall("ivf2_recall", ivf2_pairs, time.monotonic() - t0)

    if want("ann_recall"):
        t0 = time.monotonic()
        lsh_pairs = _mirror_lsh_single(sf_dir)
        check_recall("ann_recall", lsh_pairs, time.monotonic() - t0)

    if want("ann_multiprobe_recall"):
        t0 = time.monotonic()
        mp_pairs = {
            (q, n)
            for q, lst in _mirror_multiprobe(sf_dir).items()
            for (n, _c, _r) in lst
        }
        check_recall("ann_multiprobe_recall", mp_pairs,
                     time.monotonic() - t0)

    if want("pq_ann") or want("pq_recall"):
        t0 = time.monotonic()
        pq_want = _mirror_pq(sf_dir)
        pq_prep = time.monotonic() - t0
        if want("pq_ann"):
            t0 = time.monotonic()
            got_pq: dict[int, list] = {}
            for r in qs["pq_ann"](spark, sf_dir).collect():
                got_pq.setdefault(r["vec_id"], []).append(
                    (r["neighbor"], r["cosine"])
                )
            spark.catalog.clearCache()
            match = got_pq == {q: v for q, v in pq_want.items() if v}
            record("pq_ann", match, sum(map(len, got_pq.values())),
                   pq_prep + time.monotonic() - t0)
        if want("pq_recall"):
            pq_pairs = {
                (q, n) for q, lst in pq_want.items() for (n, _c) in lst
            }
            check_recall("pq_recall", pq_pairs, pq_prep)

    if want("i6c_quantized_rerank"):
        t0 = time.monotonic()
        i6c_want = _mirror_i6c(sf_dir)
        got_i6c: dict[int, list] = {}
        for r in qs["i6c_quantized_rerank"](spark, sf_dir).collect():
            got_i6c.setdefault(r["vec_id"], []).append(
                (r["neighbor"], r["cosine"])
            )
        spark.catalog.clearCache()
        match = got_i6c == {q: v for q, v in i6c_want.items() if v}
        record("i6c_quantized_rerank", match,
               sum(map(len, got_i6c.values())), time.monotonic() - t0)

    if want("pretrain_corpus"):
        t0 = time.monotonic()
        fp_want = _mirror_pretrain(sf_dir)
        got_fp = {
            (r["lang"], r["source"], r["n_docs"], r["total_tokens"])
            for r in qs["pretrain_corpus"](spark, sf_dir).collect()
        }
        spark.catalog.clearCache()
        record("pretrain_corpus", got_fp == fp_want, len(got_fp),
               time.monotonic() - t0)

'''

p = "tools/sf1_parity.py"
s = open(p).read()

# 1. insert the new mirror functions before run_mirrors
anchor = "def run_mirrors(spark, qs, sf_dir: str, results: dict,"
assert anchor in s
s = s.replace(anchor, NEW_FUNCS + "\n\n" + anchor, 1)

# 2. wire the checks in before the trailing `return fails` of run_mirrors
tail = "    return fails\n\n\ndef main("
assert tail in s
s = s.replace(tail, WIRING + "    return fails\n\n\ndef main(", 1)

# 3. update SKIP: drained names now carry mirror-checked notes
repl = {
    '"ann_recall": "recall oracle recomputes exact kNN (all pairs)",':
        '"ann_recall": "recall oracle recomputes exact kNN (all pairs)'
        ' — mirror-checked",',
    '"ann_multiprobe_recall": "recall oracle recomputes exact kNN (all pairs)",':
        '"ann_multiprobe_recall": "recall oracle recomputes exact kNN'
        ' (all pairs) — mirror-checked",',
    '"ivf_recall": "recall oracle recomputes exact kNN (all pairs)",':
        '"ivf_recall": "recall oracle recomputes exact kNN (all pairs)'
        ' — mirror-checked",',
    '"pq_recall": "recall oracle recomputes exact kNN (all pairs)",':
        '"pq_recall": "recall oracle recomputes exact kNN (all pairs)'
        ' — mirror-checked",',
    '"pq_ann": "SDC oracle scans all PQ-code pairs (400M)",':
        '"pq_ann": "SDC oracle scans all PQ-code pairs (400M)'
        ' — mirror-checked",',
    '"i6c_quantized_rerank": "oracle scans all quantized pairs (400M)",':
        '"i6c_quantized_rerank": "oracle scans all quantized pairs (400M)'
        ' — mirror-checked",',
    '"ivf2_recall": "recall oracle recomputes exact kNN (all pairs)",':
        '"ivf2_recall": "recall oracle recomputes exact kNN (all pairs)'
        ' — mirror-checked",',
    '"pretrain_corpus": "end-to-end DAG embeds i4b (oracle spills >80 GB)",':
        '"pretrain_corpus": "oracle trigram self-join spills at sf1'
        ' — mirror-checked (full-DAG Python mirror)",',
}
for old, new in repl.items():
    assert old in s, old
    s = s.replace(old, new, 1)

open(p, "w").write(s)
print("mirror block spliced")
