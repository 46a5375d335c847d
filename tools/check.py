#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfdir> <verify_out_dir>

For each query dumped by graft.Verify: load the Spark parquet result,
run the oracle SQL in DuckDB against views over the same parquet
tables, sort columns by name, and compare row-by-row IN ROW ORDER
with exact equality (floats must be bit-identical — SURVEY §5's
determinism rules are designed to make that hold, and the driver's
real gate hashes values in row order, so an ORDER BY mismatch must
fail here too, not be silently absorbed by sorting).
"""
import datetime, json, math, sys
from decimal import Decimal
import duckdb

NUMERIC = (int, float, Decimal)
DATETIME = (datetime.date, datetime.datetime, datetime.time)

def cell_key(v):
    # Type-stable sort key: NaN gets its own flag instead of a string
    # substitute (a column mixing NaN and numbers must not raise), and
    # values only ever compare within their own type bucket.
    if isinstance(v, float) and math.isnan(v):
        return (v is None, str(type(v)), True, 0.0)
    return (v is None, str(type(v)), False, 0.0 if v is None else v)

def canon_cols(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols), [tuple(r[i] for i in order) for r in rows]

def cell_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    # Python bool subclasses int, so without this guard True == 1 slips
    # through the numeric branch — exactly the bool→int schema drift
    # this gate claims to fail on. bool-vs-bool still compares below.
    if (type(a) is bool) != (type(b) is bool):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # Numeric cross-type (int / float / Decimal): Python's == is an
    # EXACT value comparison across all three (floats convert to their
    # exact binary value, Decimal scale is ignored: Decimal('1.50') ==
    # 1.5 and == Decimal('1.5')). No str() fallback here — '1' vs 1 or
    # a stringified number must FAIL, because a Spark type regression
    # (number → string) is exactly what the bit-exactness gate exists
    # to catch.
    if isinstance(a, NUMERIC) and isinstance(b, NUMERIC):
        return a == b
    # Datetime family may differ in concrete type across the two read
    # paths (date vs datetime at midnight) — compare canonically.
    if isinstance(a, DATETIME) and isinstance(b, DATETIME):
        return str(a) == str(b)
    # Everything else: same type, exact equality. A cross-type pair
    # (str vs number, bool vs int, ...) is a schema drift → fail.
    return type(a) is type(b) and a == b

def rows_eq(gr, er):
    return all(
        all(cell_eq(x, y) for x, y in zip(a, b)) for a, b in zip(gr, er))

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
            gc, gr = canon_cols(grows, gcols)
            ec, er = canon_cols(erows, ecols)
            if gc != ec:
                print(f"FAIL {name}: columns {gc} != {ec}")
                n_fail += 1
                continue
            if len(gr) != len(er):
                print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
                n_fail += 1
                continue
            if rows_eq(gr, er):
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
                continue
            # Distinguish "wrong values" from "right values, wrong
            # order": both are failures (the driver hashes in row
            # order), but the remedy differs (fix the query vs fix its
            # ORDER BY).
            key = lambda t: tuple(cell_key(v) for v in t)
            if rows_eq(sorted(gr, key=key), sorted(er, key=key)):
                print(f"FAIL {name}: rows match only after sorting — "
                      "ORDER BY mismatch or non-total sort key")
            else:
                bad = next((i, a, b) for i, (a, b) in enumerate(zip(gr, er))
                           if not all(cell_eq(x, y) for x, y in zip(a, b)))
                print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} oracle={bad[2]}")
            n_fail += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
