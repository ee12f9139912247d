#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and compare (column names sorted, values hashed).
Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import glob
import hashlib
import json
import math
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ("documents", "events", "embeddings", "lineitem", "orders", "customer",
          "supplier", "part", "region", "nation"):
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    except Exception:
        pass


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for r in rows:
        h.update("|".join(norm_cell(r[i]) for i in order).encode())
        h.update(b"\n")
    return h.hexdigest()


fails = 0
for name in sorted(oracles):
    sql = oracles[name]
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fails += 1
        continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
    got_cols = [d[0] for d in con.description]
    try:
        exp_rel = con.sql(sql)
        # The driver's hasher stringifies DECIMAL/HUGEINT cells differently
        # from int, so any oracle producing such a column hash-fails on the
        # driver even when .fetchall() (which coerces to Python int) agrees.
        # Fail loudly here so the builder catches it before the driver does.
        bad_types = [f"{c}:{t}" for c, t in zip(exp_rel.columns, exp_rel.types)
                     if "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()]
        if bad_types:
            print(f"{name}: ORACLE TYPE ERROR (cast to BIGINT/DOUBLE): {bad_types}")
            fails += 1
            continue
        exp = con.execute(sql).fetchall()
        exp_cols = [d[0] for d in con.description]
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    schema_ok = sorted(got_cols) == sorted(exp_cols)
    rows_ok = len(got) == len(exp)
    hash_ok = schema_ok and table_hash(got_cols, got) == table_hash(exp_cols, exp)
    status = "OK" if (schema_ok and rows_ok and hash_ok) else "MISMATCH"
    if status != "OK":
        fails += 1
        print(f"{name}: {status} schema_ok={schema_ok} rows {len(got)} vs {len(exp)}")
        if schema_ok and rows_ok:
            order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            eorder = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
            shown = 0
            for i, (g, e) in enumerate(zip(got, exp)):
                gn = [norm_cell(g[j]) for j in order]
                en = [norm_cell(e[j]) for j in eorder]
                if gn != en and shown < 3:
                    print(f"   row {i}: got={gn} exp={en}")
                    shown += 1
        else:
            print(f"   got cols={got_cols} exp cols={exp_cols}")
            print(f"   got head={got[:2]} exp head={exp[:2]}")
    else:
        print(f"{name}: OK ({len(got)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
