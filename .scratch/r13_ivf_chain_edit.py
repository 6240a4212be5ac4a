"""Round-13 splice: factor the flat-IVF oracle chain into a shared
_IVF_CHAIN constant with hash seeding (VERDICT r12 item 1)."""
import re

P = "etl_data_pipeline_spark/plans/vectors.py"
s = open(P).read()

# --- 1. capture the verbatim d1..probe tail from the ivf_ann oracle ---
m = re.search(
    r'("ivf_ann",\n    oracle=""")(.*?)(, pairs AS \()', s, re.S
)
assert m, "ivf_ann oracle not found"
old_ann_chain = m.group(2)
ti = old_ann_chain.index("), d1 AS (")
tail = old_ann_chain[ti + len("), ") :]  # 'd1 AS (' ... 'probe AS (...)\n    '
assert tail.startswith("d1 AS (") and "probe AS (" in tail

NEW_HEAD = """
    p AS (
      SELECT COUNT(*) AS n,
             GREATEST(4, COUNT(*) // 125) AS nlist,
             GREATEST(2, GREATEST(4, COUNT(*) // 125) // 5) AS nprobe,
             CAST(LEAST(4294967296, (CAST(4294967296 AS HUGEINT)
                  * (2 * GREATEST(4, COUNT(*) // 125) + 64))
                  // COUNT(*) + 1) AS BIGINT) AS thresh
      FROM embeddings
    ), grid AS (
      SELECT vec_id, i.range AS pos,
             CAST(FLOOR(CAST(embedding[i.range + 1] AS DOUBLE) * 1000000) AS BIGINT) AS gv
      FROM embeddings, RANGE(64) i
    ), hs AS (
      SELECT vec_id,
             ((vec_id % 4294967296) * 1327217885) % 4294967296 AS h
      FROM embeddings
    ), cnd AS (
      SELECT hs.vec_id,
             ROW_NUMBER() OVER (ORDER BY hs.h, hs.vec_id) AS srn
      FROM hs, p WHERE hs.h < p.thresh
    ), c0 AS (
      SELECT cnd.vec_id AS cell, g.pos, g.gv AS c
      FROM cnd, p, grid g
      WHERE g.vec_id = cnd.vec_id AND cnd.srn <= p.nlist
    ), """

chain_const = (
    '#: Shared flat-IVF oracle chain (params -> grid -> Knuth-hash seeds\n'
    '#: -> 3-iteration integer k-means -> assign + probe), embedded by\n'
    '#: BOTH flat-IVF oracles so a one-sided edit is impossible (the\n'
    '#: _HIER_CHAIN precedent; sync-guarded by tests/test_ann_hier.py::\n'
    '#: test_ivf_oracles_share_one_chain).  Seeds (round 13, VERDICT r12\n'
    '#: item 1): the nlist smallest (h, vec_id) under the exact-integer\n'
    '#: hash h = ((vec_id % 2^32) * 1327217885) % 2^32, restricted first\n'
    '#: to h < thresh (expected 2*nlist + 64 candidates) — the verbatim\n'
    '#: mirror of operators/ann_adaptive.py::hash_seeds, which replaced\n'
    '#: the global-rank stride sample so the engine build never sorts\n'
    '#: the corpus in one task; the ROW_NUMBER here ranks only the\n'
    '#: candidate set.\n'
    '_IVF_CHAIN = """' + NEW_HEAD + tail.rstrip() + '\n"""\n\n\n'
)

# --- 2. rewrite the ivf_ann oracle to embed the constant ---
new_ann_decor = (
    '@query(\n    "ivf_ann",\n    oracle="""\n    WITH """\n'
    '    + _IVF_CHAIN\n    + """, pairs AS ('
)
start = s.index('@query(\n    "ivf_ann",')
end = s.index(', pairs AS (', start) + len(', pairs AS (')
# sanity: the removed span is the old decorator head + chain
removed = s[start:end]
assert 'stride' in removed and 'rk AS' in removed
s = s[:start] + chain_const + new_ann_decor + s[end:]

# --- 3. rewrite the ivf_recall oracle chain ---
# its chain sits between '), p AS (' (after the exact CTE) and ', icand AS ('
rstart = s.index('@query(\n    "ivf_recall",')
ricand = s.index(', icand AS (', rstart)
# the chain starts at '    ), p AS (' following 'WHERE rn <= 3' of exact
pstart = s.index('    ), p AS (', rstart)
old_recall_chain = s[pstart:ricand]
assert 'stride' in old_recall_chain and 'rk AS' in old_recall_chain
new_recall = (
    '    ), """\n    + _IVF_CHAIN\n    + """'
)
s = s[:pstart] + new_recall + s[ricand:]
open(P, "w").write(s)
print("spliced OK")
