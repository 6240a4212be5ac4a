#!/usr/bin/env python
"""Small-data / empty-partition stress: run EVERY registered query at a
small scale factor with MORE shuffle partitions than most groups have
rows (default sf0.001 x 32), comparing against the DuckDB oracles.

This is the regime that produced the `_skyline_block` crash (ADVICE r5:
mapInPandas invokes the UDF with an empty iterator when shuffle
partitions exceed distinct groups) — the standing sf0.01 emulator never
exercises it.  Usage::

    python tools/stress_small_sf.py [sf_dir] [shuffle_partitions] [master]

Also useful as a parallelism-determinism probe: ``... sf0.01 7
local[4]`` re-checks every oracle under an odd partitioning/core count
(271/0/0 on 2026-08-14, alongside sf0.001 x 32 and the standing sf0.01
x 8 emulator — three regimes, identical hashes).

Fourth regime (VERDICT r8 item 1): ``... sf0.001 8
local-cluster[2,4,4096]`` runs every query under REAL separate
executor JVMs — the only locally-available mode that exercises closure
serialization, broadcast transport, and executor-side module import
(kernels are module-level functions resolved by import on the
executor's Python workers), a failure class ``local[*]`` structurally
cannot surface because driver and executor share one JVM/interpreter.
Must run as a DEDICATED subprocess: the r8 attempt built the session
during interpreter teardown and died with 'Shutdown hooks cannot be
modified during shutdown' (executor launch racing JVM exit).
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
PARTS = sys.argv[2] if len(sys.argv) > 2 else "32"
MASTER = sys.argv[3] if len(sys.argv) > 3 else "local[8]"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(pdf) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    cells = ["|".join(repr(v) for v in row.tolist()) for _, row in pdf.iterrows()]
    return hashlib.sha256("\n".join(sorted(cells)).encode()).hexdigest()


def main() -> None:
    builder = (
        SparkSession.builder.master(MASTER)
        .config("spark.sql.shuffle.partitions", PARTS)
        .config("spark.ui.enabled", "false")
    )
    if MASTER.startswith("local-cluster"):
        # Executor JVMs are separate processes; their Python workers
        # resolve the engine's module-level kernels by IMPORT, so the
        # repo root must be on the executor-side PYTHONPATH (the
        # driver-side sys.path insert above does nothing for them).
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH", str(_REPO)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from etl_data_pipeline_spark.plans import QUERIES, ORACLES, load_all_plans

    load_all_plans()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    ok = fail = err = 0
    for name in sorted(QUERIES):
        try:
            spdf = QUERIES[name](spark, SF).toPandas()
            opdf = con.execute(ORACLES[name]).fetchdf()
            good = (
                sorted(spdf.columns) == sorted(opdf.columns)
                and len(spdf) == len(opdf)
                and value_hash(spdf) == value_hash(opdf)
            )
            if good:
                ok += 1
            else:
                fail += 1
                print(
                    f"FAIL {name}: cols="
                    f"{sorted(spdf.columns) == sorted(opdf.columns)} "
                    f"rows={len(spdf)}/{len(opdf)}"
                )
        except Exception as e:  # noqa: BLE001
            err += 1
            print(f"ERR {name}: {repr(e)[:300]}")
    print(f"{SF} x {PARTS} partitions: {ok} ok, {fail} fail, {err} err")
    spark.stop()
    if fail or err:
        sys.exit(1)


if __name__ == "__main__":
    main()
