#!/usr/bin/env bash
# sf10 probe of the SQL DML/DDL + native-sink + procedure family —
# fresh JVM per (gate, sf, pass), medians from SPARK_GRAFT_BENCH_REPS
# inside each JVM.
#
# EPISODE-ROBUST protocol (SCALE.md r14 post-mortem): this host
# suffers minutes-scale co-tenant contention episodes that throttle
# any multi-threaded Spark job 10-60x — a single JVM's reps can all
# land inside one episode, so per-gate numbers come from TWO
# time-separated passes and the summary publishes the MIN across all
# reps of both passes (Bench's queries_min field): under purely
# additive interference the min is the engine-cost bound episodes can
# only raise, while a median of a few reps can land entirely inside
# one episode. Gates whose two pass-mins disagree >3x are FLAGGED
# (both windows poisoned differently — re-run, don't average).
# Scratch tables and shuffle dirs live on tmpfs so the episodes' I/O
# component stays out of the loop; source fixtures stay on disk
# (read-only, page-cached after rep 1).
#
# Usage: tools/probe_sqldml.sh <sf1_dir> <sf10_dir> <out_dir>
set -euo pipefail
SF1=${1:-/root/repo/testdata_sf1}
SF10=${2:-/root/repo/testdata_sf10}
OUT=${3:-/tmp/probe_sqldml}
export SPARK_GRAFT_SCRATCH=/dev/shm/graft_probe_scratch
export SPARK_LOCAL_DIRS=/dev/shm/graft_probe_local
mkdir -p "$SPARK_GRAFT_SCRATCH" "$SPARK_LOCAL_DIRS" "$OUT"
trap 'rm -rf /dev/shm/graft_probe_scratch /dev/shm/graft_probe_local' EXIT
GATES="sql_insert_snapshot sql_delete_snapshot sql_update_snapshot \
sql_merge_snapshot sql_ctas_snapshot sql_call_procedures \
sql_metadata_tables streaming_native_sink write_restore"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
for pass in A B; do
  for sf in sf1 sf10; do
    dir=$([ $sf = sf1 ] && echo "$SF1" || echo "$SF10")
    reps=$([ $sf = sf1 ] && echo 5 || echo 3)
    for q in $GATES; do
      echo "== pass$pass $sf $q"
      SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_BENCH_ONLY="$q" \
      SPARK_GRAFT_BENCH_REPS=$reps \
      SPARK_GRAFT_BENCH_DIR="$OUT/pass${pass}_${sf}_${q}" \
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
        -cp "$CP" graft.Bench > "$OUT/pass${pass}_${sf}_${q}.log" 2>&1 \
        || { echo "FAILED $pass $sf $q"; tail -5 "$OUT/pass${pass}_${sf}_${q}.log"; exit 1; }
      grep -h '"metric"' "$OUT/pass${pass}_${sf}_${q}.log" | tail -1
    done
  done
done
python3 - "$OUT" <<'EOF'
import json, sys, glob, os
out = sys.argv[1]
vals = {}
for f in glob.glob(f"{out}/pass*_sf*/BENCH_FULL.json"):
    tag = os.path.basename(os.path.dirname(f))
    p, sf, q = tag.split("_", 2)
    j = json.loads(open(f).read())
    d = j.get("queries_min") or j["queries"]
    vals.setdefault((sf, q), {})[p] = list(d.values())[0]
print(f"| gate | sf1 s | sf10 s | ratio on 10x | flag |")
print("|---|---|---|---|---|")
gates = sorted({q for (_, q) in vals})
for q in gates:
    row = {}
    flags = []
    for sf in ("sf1", "sf10"):
        ps = vals.get((sf, q), {})
        if len(ps) == 2:
            a, b = ps.get("passA"), ps.get("passB")
            row[sf] = min(a, b)
            if max(a, b) > 3 * min(a, b):
                flags.append(f"{sf} passes disagree {max(a,b)/min(a,b):.1f}x")
        elif ps:
            row[sf] = list(ps.values())[0]
            flags.append(f"{sf} single pass")
    r = row.get("sf10", 0) / row["sf1"] if row.get("sf1") else None
    def cell(v, fmt):
        return format(v, fmt) if isinstance(v, (int, float)) else "-"
    print(f"| {q} | {cell(row.get('sf1'), '.3f')} "
          f"| {cell(row.get('sf10'), '.3f')} "
          f"| {cell(r, '.2f')}x | {'; '.join(flags) or ''} |")
EOF
echo "probe artifacts in $OUT"
