#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle gate.

Runs after `sbt runMain graft.Verify <sfDir> <outDir>`: for each query
result parquet, runs the corresponding oracle SQL in DuckDB over the same
testdata tables, and compares values (columns sorted by name, rows sorted,
exact match; floats compared both exactly and with 1e-9 tolerance so we can
tell hash-breaking diffs from benign ones).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def eq(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            return (a == b) or (math.isnan(a) and math.isnan(b))
        except TypeError:
            return False
    return a == b


def close(a, b):
    if isinstance(a, float) and isinstance(b, (float, int)):
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return eq(a, b)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        try:
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            if "no_oracle" in str(e):
                # deliberate: the approximate-by-nature rows carry their
                # gate linkage via SELECT error('no_oracle ... gated_by')
                # so the driver's err field is self-contained
                print(f"GATE {name}: {e}")
                continue
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        gc, g = canon(got, got_cols)
        ec, e = canon(exp, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} duckdb={ec}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: row count spark={len(g)} duckdb={len(e)}")
            failures += 1
            continue
        exact = all(all(eq(a, b) for a, b in zip(rg, re_)) for rg, re_ in zip(g, e))
        if exact:
            print(f"OK   {name}: {len(g)} rows exact")
            continue
        near = all(all(close(a, b) for a, b in zip(rg, re_)) for rg, re_ in zip(g, e))
        # show first few diffs
        shown = 0
        for rg, re_ in zip(g, e):
            if not all(eq(a, b) for a, b in zip(rg, re_)):
                print(f"  diff spark={rg} duckdb={re_}")
                shown += 1
                if shown >= 3:
                    break
        status = "NEAR (float-only diffs <1e-9 — WILL FAIL hash compare)" if near else "MISMATCH"
        print(f"FAIL {name}: {status}, {len(g)} rows")
        failures += 1
    # queries without oracle → rows-only
    import os
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"ROWS {d}: {n} rows (no oracle)")
    print(f"\n{failures} failures / {len(oracle)} oracled queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
