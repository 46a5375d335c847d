#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB against views over the same parquet
tables, sort columns by name, and compare row-by-row with exact
equality (floats must be bit-identical — SURVEY §5's determinism rules
are designed to make that hold).
"""
import json, math, sys
import duckdb

def cell_key(v):
    # Type-stable sort key: NaN gets its own flag instead of a string
    # substitute (a column mixing NaN and numbers must not raise), and
    # values only ever compare within their own type bucket.
    if isinstance(v, float) and math.isnan(v):
        return (v is None, str(type(v)), True, 0.0)
    return (v is None, str(type(v)), False, 0.0 if v is None else v)

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(cell_key(v) for v in t))

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # int vs float / decimal cross-type: compare as numbers
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    return str(a) == str(b)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            gcols, grows = got.columns, got.fetchall()
            exp = con.sql(sql)
            ecols, erows = exp.columns, exp.fetchall()
            gc, gr = canon(grows, gcols)
            ec, er = canon(erows, ecols)
            if gc != ec:
                print(f"FAIL {name}: columns {gc} != {ec}")
                n_fail += 1
                continue
            if len(gr) != len(er):
                print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
                n_fail += 1
                continue
            bad = None
            for i, (a, b) in enumerate(zip(gr, er)):
                if not all(cell_eq(x, y) for x, y in zip(a, b)):
                    bad = (i, a, b)
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} oracle={bad[2]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
