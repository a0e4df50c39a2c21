#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
library itself is pure Scala/Spark). Usage:

    python3 scripts/verify_local.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet (Spark result) plus
<outDir>/oracle_sql.json, runs each oracle in DuckDB over views named after
the parquet tables in <sfDir>, and compares: column names (sorted), row
count, and the multiset of rows (sorted by all columns).
"""
import json, sys, glob, os
import duckdb


def norm_cell(v):
    if isinstance(v, float):
        # engineered determinism: values should match exactly; still guard
        # against -0.0 vs 0.0 and NaN identity
        if v != v:
            return "NaN"
        if v == 0.0:
            return 0.0
    if isinstance(v, bytes):
        return v.hex()
    return v


def norm_rows(rows):
    return sorted([tuple(norm_cell(c) for c in r) for r in rows],
                  key=lambda r: tuple((str(type(c)), str(c)) for c in r))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no Spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchall()
            got_cols = [d[0] for d in con.description]
            exp = con.execute(sql).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        # align column order by sorted name
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = norm_rows([[r[i] for i in gidx] for r in got])
        e = norm_rows([[r[i] for i in eidx] for r in exp])
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
        elif g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    # queries without oracles (rows-only): report row counts
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in oracles:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
                print(f"ROWS-ONLY {name}: {n} rows")
                n_skip += 1
            except Exception as e:
                print(f"ROWS-ONLY {name}: unreadable: {e}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
