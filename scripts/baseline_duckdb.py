#!/usr/bin/env python3
"""Engine-vs-engine baseline (dev tool only): time the gate's own oracle
SQL in DuckDB over the SAME parquet tables graft benches against, so the
"within 2x of a single-node engine" criterion has a measured number at
decade SFs, not just sf0.1.

Usage:
    python3 scripts/baseline_duckdb.py <sfDir> <oracle_sql.json> [out.json]

Per-query PROCESS isolation with an individual timeout (a single oracle
that DuckDB executes pathologically must cost its own budget, not the
whole artifact): the parent forks itself with --one per query and
appends name<TAB>seconds (or TIMEOUT/FAIL) to <out>.tsv as results
arrive, then writes the aggregate JSON. a3's recursive CTE is reported
separately — the comparison is only honest over shapes both engines run
natively. min-of-3, 32 threads.

Usage:
    python3 scripts/baseline_duckdb.py <sfDir> <oracle_sql.json> <out.json>
    BASELINE_TIMEOUT=900 ... (per-query seconds, default 900)
"""
import json, os, subprocess, sys, time
import duckdb

HEADLINERS = [
    "q1_agg", "q3_join_agg", "q5_multi_join", "q9_window_rank",
    "q18_asof_join", "q22_sessionize", "q26_custom_range_join",
    "t2_quality_score", "t8_tfidf", "d2_minhash_lsh", "d4_simhash",
    "d6_dedup_groups", "s1_bruteforce_topk", "m3_feature_stub",
    "a3_txn_conditional_state", "a6_event_time_sort"]
# BASELINE_QUERIES=q40_skew_join,t14_quality_gate,... overrides the list
# (the r15 heavy-extras sweep reuses the same per-query isolation)
if os.environ.get("BASELINE_QUERIES"):
    HEADLINERS = os.environ["BASELINE_QUERIES"].split(",")
RECURSIVE = {"a3_txn_conditional_state"}
REPS = 3


def run_one(sf_dir, oracle_path, name):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = json.load(open(oracle_path))[name]
    best = None
    for _ in range(REPS):
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:.3f}")


def main():
    if sys.argv[1] == "--one":
        run_one(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    budget = int(os.environ.get("BASELINE_TIMEOUT", "900"))
    times, failed = {}, {}
    tsv = (out_path or "baseline") + ".tsv"
    open(tsv, "w").close()
    for name in HEADLINERS:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 sf_dir, oracle_path, name],
                capture_output=True, text=True, timeout=budget)
            if r.returncode == 0:
                # scan from the end for the timing line: the child may
                # print warnings to stdout after it (r14 advice — a bare
                # float() on the last line aborted the whole sweep)
                secs = None
                for ln in reversed(r.stdout.strip().splitlines()):
                    try:
                        secs = float(ln.strip())
                        break
                    except ValueError:
                        continue
                if secs is None:
                    failed[name] = "FAIL"
                    note = "FAIL no timing line in stdout"
                else:
                    times[name] = secs
                    note = f"{times[name]:.3f}"
            else:
                failed[name] = "FAIL"
                note = "FAIL " + r.stderr.strip()[-200:]
        except subprocess.TimeoutExpired:
            failed[name] = f"TIMEOUT>{budget}s"
            note = failed[name]
        with open(tsv, "a") as f:
            f.write(f"{name}\t{note}\n")
        print(f"{name}: {note}", file=sys.stderr)
    core = {k: v for k, v in times.items() if k not in RECURSIVE}
    line = json.dumps({
        "metric": "duckdb_headliners", "unit": "sec",
        "value": round(sum(core.values()), 3),
        "queries": core,
        "recursive_excluded": {k: times[k] for k in RECURSIVE
                               if k in times},
        "failed": failed,
        "per_query_timeout_s": budget,
        "threads": 32, "reps": REPS, "sf": sf_dir})
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
