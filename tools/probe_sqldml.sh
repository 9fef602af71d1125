#!/usr/bin/env bash
# sf10 probe of the SQL DML/DDL + native-sink + procedure family —
# fresh JVM per gate per SF (the SCALE.md probe protocol), medians
# from SPARK_GRAFT_BENCH_REPS inside each JVM.
#
# Usage: tools/probe_sqldml.sh <sf1_dir> <sf10_dir> <out_dir>
set -euo pipefail
SF1=${1:-/root/repo/testdata_sf1}
SF10=${2:-/root/repo/testdata_sf10}
OUT=${3:-/tmp/probe_sqldml}
GATES="sql_insert_snapshot sql_delete_snapshot sql_update_snapshot \
sql_merge_snapshot sql_ctas_snapshot sql_call_procedures \
streaming_native_sink write_restore"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
mkdir -p "$OUT"
for sf in sf1 sf10; do
  dir=$([ $sf = sf1 ] && echo "$SF1" || echo "$SF10")
  reps=$([ $sf = sf1 ] && echo 3 || echo 2)
  for q in $GATES; do
    echo "== $sf $q"
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$q" \
    SPARK_GRAFT_BENCH_REPS=$reps SPARK_GRAFT_BENCH_DIR="$OUT/${sf}_${q}" \
    java -Xmx96g --add-modules=jdk.incubator.vector \
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
      --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
      -cp "$CP" graft.Bench > "$OUT/${sf}_${q}.log" 2>&1 \
      || { echo "FAILED $sf $q"; tail -5 "$OUT/${sf}_${q}.log"; exit 1; }
    grep -h '"metric"' "$OUT/${sf}_${q}.log" | tail -1
  done
done
echo "probe artifacts in $OUT"
