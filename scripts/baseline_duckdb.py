#!/usr/bin/env python3
"""Engine-vs-engine baseline (dev tool only): time the gate's own oracle
SQL in DuckDB over the SAME parquet tables graft benches against, so the
"within 2x of a single-node engine" criterion has a measured number at
decade SFs, not just sf0.1.

Usage:
    python3 scripts/baseline_duckdb.py <sfDir> <oracle_sql.json> [out.json]

Runs the 16 headliner oracles (a3's recursive CTE is timed but reported
separately — DuckDB executes it pathologically, and the comparison is
only honest over shapes both engines run natively), min-of-3 each,
32 threads, and prints/writes one JSON line mirroring BENCH's shape.
"""
import json, os, sys, time
import duckdb

HEADLINERS = [
    "q1_agg", "q3_join_agg", "q5_multi_join", "q9_window_rank",
    "q18_asof_join", "q22_sessionize", "q26_custom_range_join",
    "t2_quality_score", "t8_tfidf", "d2_minhash_lsh", "d4_simhash",
    "d6_dedup_groups", "s1_bruteforce_topk", "m3_feature_stub",
    "a3_txn_conditional_state", "a6_event_time_sort"]
RECURSIVE = {"a3_txn_conditional_state"}
REPS = 3


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(oracle_path))
    times = {}
    for name in HEADLINERS:
        sql = oracles[name]
        best = None
        for _ in range(REPS):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"{name}: {best:.3f} s", file=sys.stderr)
    core = {k: v for k, v in times.items() if k not in RECURSIVE}
    line = json.dumps({
        "metric": "duckdb_headliners", "unit": "sec",
        "value": round(sum(core.values()), 3),
        "queries": core,
        "recursive_excluded": {k: times[k] for k in RECURSIVE},
        "threads": 32, "reps": REPS, "sf": sf_dir})
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
