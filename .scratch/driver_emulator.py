"""Standalone driver emulator: consumes __spark_entry__.py exactly per its
documented contract (entry smoke at sf0.001; each queries()[name] at sf0.01
vs oracle_sql()[name] in DuckDB: row-count + schema + order-insensitive
value-hash)."""
import hashlib, importlib.util, json, sys
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def value_hash(pdf: pd.DataFrame, shuffle=False) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if shuffle and len(pdf):
        pdf = pdf.sample(frac=1.0, random_state=7)
    cells = []
    for _, row in pdf.iterrows():
        cells.append("|".join(repr(v) for v in row.tolist()))
    return hashlib.sha256("\n".join(sorted(cells)).encode()).hexdigest()

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)

# t1 smoke
edf = m.entry(spark)
rows = edf.collect()
print(f"T1 entry: {len(rows)} rows, schema={edf.schema.simpleString()}")
assert len(rows) > 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')")

qs, oracles = m.queries(), m.oracle_sql()
ok = fail = 0
for name in sorted(qs):
    spdf = qs[name](spark, SF01).toPandas()
    if name not in oracles:
        print(f"  ~ {name}: rows-only, {len(spdf)} rows")
        continue
    opdf = con.execute(oracles[name]).fetchdf()
    # normalize exactly like a canonical hasher would NOT — raw repr hashing
    schema_match = sorted(spdf.columns) == sorted(opdf.columns)
    count_match = len(spdf) == len(opdf)
    h_s, h_o = value_hash(spdf), value_hash(opdf)
    hash_match = h_s == h_o
    # probe: order-insensitivity of the hash itself
    assert value_hash(spdf, shuffle=True) == h_s
    status = "OK " if (schema_match and count_match and hash_match) else "FAIL"
    if status == "OK ": ok += 1
    else:
        fail += 1
        print(f"  {status} {name}: schema={schema_match} count={count_match} ({len(spdf)}/{len(opdf)}) hash={hash_match}")
        if schema_match and count_match and not hash_match:
            a = spdf.reindex(sorted(spdf.columns), axis=1).astype(str).apply("|".join, axis=1).sort_values().tolist()
            b = opdf.reindex(sorted(opdf.columns), axis=1).astype(str).apply("|".join, axis=1).sort_values().tolist()
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
            for x, y in diffs: print(f"      spark={x!r}\n      duck ={y!r}")
print(f"T2: {ok} hash-match, {fail} fail, {len(qs)-len(oracles)} rows-only")
sys.exit(1 if fail else 0)
