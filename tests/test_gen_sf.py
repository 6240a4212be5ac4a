"""tools/gen_sf.py generator invariants — the sf1 scale evidence
(SLOPE_AUDIT_SF1.json, the BASELINE sf1 row) is only as good as the
generated data's fidelity to the profiled sf0.1 distributions, so the
distributional claims in the generator's docstring are pinned here on
a small generated sample (sf0.02 -> seconds, same code path).

No SparkSession needed — pure pyarrow/numpy over the generated files.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import numpy as np
import pyarrow.parquet as pq
import pytest

_REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    spec = importlib.util.spec_from_file_location(
        "gen_sf", _REPO / "tools" / "gen_sf.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path_factory.mktemp("gensf") / "sf0.02"
    mod.gen(0.02, str(out))
    return out


def _read(gen_dir, name):
    return pq.read_table(gen_dir / f"{name}.parquet")


def test_row_counts_scale_from_the_profiled_sf01(gen_dir):
    t = {n: _read(gen_dir, n).num_rows for n in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings").split()}
    assert t["region"] == 5 and t["nation"] == 25
    assert t["lineitem"] == 120_000 and t["orders"] == 30_000
    assert t["documents"] == 1_000 and t["embeddings"] == 400


def test_money_columns_sit_exactly_on_the_2dp_grid(gen_dir):
    li = _read(gen_dir, "lineitem")
    for col in ("l_extendedprice", "l_discount", "l_tax"):
        v = np.asarray(li[col])
        cents = v * 100
        assert np.all(np.abs(cents - np.round(cents)) < 1e-6), col
    q = np.asarray(li["l_quantity"])
    assert np.all(q == np.round(q)) and q.min() >= 1 and q.max() <= 50


def test_documents_near_dups_strip_back_to_a_source_doc(gen_dir):
    """The dedup structure the text operators are tuned against: ~5%
    of docs contain the literal 'dup' token, and each strips back to
    another doc's exact text (the measured sf0.1 mechanism)."""
    d = _read(gen_dir, "documents")
    texts = d["text"].to_pylist()
    n_chars = d["n_chars"].to_pylist()
    assert all(len(t) == n for t, n in zip(texts, n_chars))
    all_texts = set(texts)
    dup_docs = [t for t in texts if " dup " in f" {t} "]
    assert 0.03 <= len(dup_docs) / len(texts) <= 0.07
    stripped_hits = sum(
        1 for t in dup_docs
        if t.replace(" dup", "", 1).replace("dup ", "", 1) in all_texts
    )
    assert stripped_hits / len(dup_docs) > 0.9
    # exact duplicates exist too (~0.16%)
    assert len(texts) - len(all_texts) >= 1


def test_embeddings_unit_norm_with_weak_label_signal(gen_dir):
    e = _read(gen_dir, "embeddings")
    v = np.array(e["embedding"].to_pylist(), dtype=np.float32)
    labels = np.asarray(e["label"])
    assert v.shape[1] == 64
    norms = np.linalg.norm(v, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    cents = np.array([v[labels == l].mean(axis=0) for l in range(10)])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    acc = ((v @ cents.T).argmax(axis=1) == labels).mean()
    # weak by design: calibrated to the profiled 0.203 (chance = 0.1);
    # small-sample slack on 400 vectors
    assert 0.10 < acc < 0.45


def test_events_keep_the_nanos_physical_type_and_json_props(gen_dir):
    col = pq.ParquetFile(gen_dir / "events.parquet").metadata.schema.column(1)
    assert "nanoseconds" in str(col.logical_type)
    ev = _read(gen_dir, "events")
    for p in ev["props"].to_pylist()[:50]:
        k = json.loads(p)["k"]
        assert 0 <= k <= 99


def test_lineitem_fks_land_inside_their_parents(gen_dir):
    li = _read(gen_dir, "lineitem")
    assert int(np.asarray(li["l_orderkey"]).max()) < 30_000
    assert int(np.asarray(li["l_partkey"]).max()) < 4_000
    assert int(np.asarray(li["l_suppkey"]).max()) < 200
