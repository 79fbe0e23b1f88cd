#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <out>/<query>/ parquet result, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = <sfDir>/*.parquet), sorts columns by
name, and compares row-by-row for exact equality (bitwise for floats).
"""
import json
import sys
import glob
import os

import duckdb
import pyarrow.parquet as pq


def load_result(path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return pq.read_table(files[0])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for qdir in sorted(os.listdir(out_dir)):
        full = os.path.join(out_dir, qdir)
        if not os.path.isdir(full):
            continue
        got = load_result(full)
        if got is None:
            print(f"FAIL {qdir}: no result parquet")
            n_fail += 1
            continue
        if qdir not in oracles:
            print(f"skip {qdir}: rows-only ({got.num_rows} rows)")
            n_skip += 1
            continue
        try:
            want = con.execute(oracles[qdir]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {qdir}: oracle error: {e}")
            n_fail += 1
            continue
        gcols, wcols = sorted(got.column_names), sorted(want.column_names)
        if gcols != wcols:
            print(f"FAIL {qdir}: columns {gcols} != {wcols}")
            n_fail += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {qdir}: rows {got.num_rows} != {want.num_rows}")
            n_fail += 1
            continue
        bad = None
        for c in gcols:
            gv = got.column(c).to_pylist()
            wv = want.column(c).to_pylist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                if isinstance(a, float) and isinstance(b, float):
                    eq = (a == b) or (a != a and b != b)
                else:
                    eq = a == b
                if not eq:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        gt = {c: str(got.schema.field(c).type) for c in gcols}
        wt = {c: str(want.schema.field(c).type) for c in wcols}
        tmism = {c: (gt[c], wt[c]) for c in gcols if gt[c] != wt[c]}
        if bad:
            c, i, a, b = bad
            print(f"FAIL {qdir}: value mismatch col={c} row={i}: got={a!r} want={b!r}")
            n_fail += 1
        elif tmism:
            print(f"WARN {qdir}: values equal but types differ: {tmism}")
            n_pass += 1
        else:
            print(f"pass {qdir} ({got.num_rows} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
