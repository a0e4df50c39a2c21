#!/bin/bash
# Round-15 isolated sf100 probes (quiet host, one JVM per query):
#   1. q43 min-of-3  — validates the r15 scale fix (was 138.5 s / 26.6x
#      isolated in r14); rep 1 also builds the persisted bucketed layout
#      for the SF dir (excluded by the min).
#   2. q60/h5 REPS=1 in FRESH JVMs — the persisted-layout cold-attach
#      proof: r14 paid the 32-bucket rewrite per process (180.8/141.7 s);
#      now a new process should pay only the catalog attach.
#   3. g17/d11/s4 min-of-3 — the r14 sweep's un-isolated watch flags
#      (209/132/70 s single-rep, coupled host).
set -e
cd /root/repo
SF=${1:-/root/repo/sf100data}
OUT=${2:-/tmp/probe_r15_sf100.tsv}
: > "$OUT"
run() { # reps queries...
  local reps=$1; shift
  SPARK_GRAFT_REPS=$reps SPARK_DRIVER_MEM=80g \
    scripts/probe_java.sh graft.SweepProbe "$SF" "$OUT" "$@" 2>>/tmp/probe_r15_sf100.log
}
run 3 q43_market_share
run 1 q60_bucketed_fact_join
run 1 h5_bucketed_join
run 3 g17_stream_kmv_distinct
run 3 d11_semantic_dedup
run 3 s4_knn_join
echo DONE >> "$OUT"
