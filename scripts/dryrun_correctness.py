"""Driver-style correctness dry-run: run every __ray_entry__.queries() entry
against oracle_sql() in DuckDB at a given sf dir, compare rows/schema/value-hash
the way the driver does (sort columns by name, sort rows, hash values).

Run from a cwd OUTSIDE /root/repo (worker-import gotcha).
"""
import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:]) or None

ray.init(address="local", num_cpus=16, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")

import __ray_entry__ as E

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def vhash(df: pd.DataFrame) -> str:
    h = hashlib.sha1()
    for c in df.columns:
        col = df[c]
        h.update(c.encode())
        h.update(str(col.dtype).encode())
        for v in col.tolist():
            h.update(repr(v).encode())
    return h.hexdigest()


con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()
results = {}
for name, fn in qs.items():
    if ONLY and name not in ONLY:
        continue
    t0 = time.time()
    try:
        mine = to_pandas(fn(SF))
    except Exception as ex:
        results[name] = {"error": f"{type(ex).__name__}: {ex}"}
        print(f"{name}: RAY-ERROR {ex}")
        continue
    el = time.time() - t0
    if name not in oracles:
        results[name] = {"rows": len(mine), "oracle": False, "sec": round(el, 2)}
        print(f"{name}: rows-only {len(mine)} rows ({el:.1f}s)")
        continue
    try:
        orc = con.execute(oracles[name]).fetchdf()
    except Exception as ex:
        results[name] = {"error": f"oracle: {ex}"}
        print(f"{name}: ORACLE-ERROR {ex}")
        continue
    cm = canon(mine)
    co = canon(orc)
    row_match = len(cm) == len(co)
    schema_match = list(cm.columns) == list(co.columns)
    hash_match = row_match and schema_match and vhash(cm) == vhash(co)
    results[name] = {"rows": len(cm), "row_match": row_match,
                     "schema_match": schema_match, "hash_match": hash_match,
                     "sec": round(el, 2)}
    flag = "OK" if hash_match else "FAIL"
    print(f"{name}: {flag} rows={len(cm)}/{len(co)} schema={schema_match} ({el:.1f}s)")
    if not hash_match and row_match and schema_match:
        for c in cm.columns:
            if str(cm[c].dtype) != str(co[c].dtype):
                print(f"   dtype {c}: mine={cm[c].dtype} oracle={co[c].dtype}")
            elif not cm[c].equals(co[c]):
                neq = (cm[c] != co[c])
                print(f"   values {c}: {neq.sum()} differ; first: "
                      f"mine={cm[c][neq].iloc[0]!r} oracle={co[c][neq].iloc[0]!r}")

bad = [k for k, v in results.items() if v.get("error") or v.get("hash_match") is False]
print(json.dumps({"n": len(results), "bad": bad}))
ray.shutdown()
