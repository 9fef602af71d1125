#!/usr/bin/env bash
# r16 scan/measurement campaign (SCALE.md consumers):
#   1. graft.tools.ScanProbe at sf10 — rowGroupBytes A/B on compacted
#      tables, the single-large-file split payoff, parquet predicate
#      pushdown A/B, and the reader-vs-vectorized constant.
#   2. the four r15→r15 compaction-family bench regressions
#      (write_compacted, write_optimize_snapshot, etl_curate_e2e,
#      streaming_pipeline_snapshot) re-run at sf0.1 under the 16 MB
#      default vs a 128 MB row-group bound — if the r15 bound is the
#      regression mechanism, 128 MB recovers the r14 times.
# Protocol: episode-robust (SCALE.md) — fresh JVM per cell, two
# time-separated passes, consume MINs; tmpfs scratch + shuffle.
set -euo pipefail
SF01=${1:-/root/testdata/sf0.1}
SF10=${2:-/root/repo/testdata_sf10}
OUT=${3:-/tmp/probe_scan_r16}
export SPARK_GRAFT_SCRATCH=/dev/shm/graft_probe_scratch
export SPARK_LOCAL_DIRS=/dev/shm/graft_probe_local
mkdir -p "$SPARK_GRAFT_SCRATCH" "$SPARK_LOCAL_DIRS" "$OUT"
trap 'rm -rf /dev/shm/graft_probe_scratch /dev/shm/graft_probe_local' EXIT
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
JOPTS="-Xmx96g --add-modules=jdk.incubator.vector \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

GATES="write_compacted,write_optimize_snapshot,etl_curate_e2e,streaming_pipeline_snapshot"
for pass in A B; do
  echo "== ScanProbe sf10 pass$pass"
  # shellcheck disable=SC2086
  java $JOPTS -cp "$CP" graft.tools.ScanProbe "$SF10" \
    > "$OUT/scanprobe_pass$pass.log" 2>&1 || {
      echo FAILED; tail -5 "$OUT/scanprobe_pass$pass.log"; exit 1; }
  grep '\[probe\]' "$OUT/scanprobe_pass$pass.log"
  for rg in 16777216 134217728; do
    echo "== gates sf0.1 rg=$rg pass$pass"
    SPARK_GRAFT_SF_DIR="$SF01" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_REPS=5 SPARK_GRAFT_BENCH_ONLY="$GATES" \
    SPARK_GRAFT_ROWGROUP_BYTES=$rg \
    java $JOPTS -cp "$CP" graft.Bench \
      > "$OUT/gates_rg${rg}_pass$pass.log" 2>&1 || {
        echo FAILED; tail -5 "$OUT/gates_rg${rg}_pass$pass.log"; exit 1; }
    grep -h '"metric"' "$OUT/gates_rg${rg}_pass$pass.log" | tail -1
  done
done
