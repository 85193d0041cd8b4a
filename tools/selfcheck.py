#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on each oracle SQL from `outDir/oracle_sql.json` against the same
parquet tables, and compares with the Spark result parquet written by
`graft.Verify` (columns sorted by name, rows sorted, values normalized).

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def normalize(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    # timestamps → isoformat for stable compare
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_ok = n_bad = 0
    results = sorted(p for p in Path(out_dir).iterdir() if p.is_dir())
    oracled = {p.name: p for p in results}
    for name, sql in sorted(oracle.items()):
        if name not in oracled:
            print(f"FAIL {name}: no spark result dir")
            n_bad += 1
            continue
        got = con.sql(f"SELECT * FROM '{oracled[name]}/*.parquet'")
        g_cols, g_rows = canon(got.fetchall(), list(got.columns))
        try:
            exp = con.sql(sql)
            e_cols, e_rows = canon(exp.fetchall(), list(exp.columns))
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL {name}: cols spark={g_cols} duckdb={e_cols}")
            n_bad += 1
        elif g_rows != e_rows:
            n_bad += 1
            print(f"FAIL {name}: rows spark={len(g_rows)} duckdb={len(e_rows)}")
            for i, (a, b) in enumerate(zip(g_rows, e_rows)):
                if a != b:
                    print(f"  first diff @{i}: spark={a} duckdb={b}")
                    break
        else:
            n_ok += 1
            print(f"ok   {name} ({len(g_rows)} rows)")
    for p in results:
        if p.name not in oracle:
            print(f"rows-only {p.name}")
    print(f"== {n_ok} ok, {n_bad} fail, "
          f"{len(results) - len(set(oracle) & set(oracled))} rows-only ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
