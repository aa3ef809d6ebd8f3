#!/usr/bin/env python3
"""Repeat-run determinism audit: compare two `graft.Verify` output dirs
query by query (column-name-sorted, row-sorted, exact values — the same
canonicalization as check.py). The round-10 rank race proved a query can
be green against the oracle in one run and wrong in the next; diffing
two independent runs catches per-run nondeterminism on an axis the
oracle compare cannot (both runs vs each other, not each vs DuckDB).

Usage: determinism_diff.py <outDirA> <outDirB>
"""
import glob, math, os, sys
import duckdb


def canon(con, qdir):
    rows = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").fetchall()
    cols = [d[0] for d in con.execute(
        f"SELECT * FROM '{qdir}/*.parquet' LIMIT 0").description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        return v

    # key=repr: rows can hold NULLs (None is unorderable against
    # ints/strs); any total order works as long as both runs use it
    return sorted(cols), sorted(
        (tuple(cell(r[i]) for i in order) for r in rows), key=repr)


def main(a, b):
    con = duckdb.connect()
    names_a = {os.path.basename(p) for p in glob.glob(os.path.join(a, "*"))
               if os.path.isdir(p)}
    names_b = {os.path.basename(p) for p in glob.glob(os.path.join(b, "*"))
               if os.path.isdir(p)}
    n_same = n_diff = 0
    for only, where in ((names_a - names_b, b), (names_b - names_a, a)):
        for n in sorted(only):
            print(f"MISSING {n}: absent from {where}")
            n_diff += 1
    for name in sorted(names_a & names_b):
        try:
            ca, cb = canon(con, os.path.join(a, name)), canon(
                con, os.path.join(b, name))
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_diff += 1
            continue
        if ca == cb:
            n_same += 1
        else:
            n_diff += 1
            if ca[0] != cb[0]:
                print(f"DIFF {name}: schemas {ca[0]} vs {cb[0]}")
            else:
                bad = [(x, y) for x, y in zip(ca[1], cb[1]) if x != y]
                print(f"DIFF {name}: {len(bad)} row(s) differ; first: "
                      f"{bad[0] if bad else (len(ca[1]), len(cb[1]))}")
    print(f"\n{n_same} identical, {n_diff} differ")
    return 1 if n_diff else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
