#!/bin/bash
# Round-11 sf100 full-registry leg (r10 verdict item 1): fresh JVM per
# ~20-query chunk so one query's heap/spill debt cannot cascade into the
# rest of the alphabet (the r10 single-JVM leg died this way: 86/173 -1
# sentinels after ml_ann_join exhausted the disk). ml_ann_join runs as
# its own final chunk. Spill dirs are leg-private (SPARK_LOCAL_DIRS) and
# wiped between chunks. Runs on a FROZEN classpath (target/leg-classes-*)
# so concurrent dev recompiles cannot change the code mid-leg.
#
# Usage: tools/sf100_leg.sh [start_chunk]   # resume support
set -u
cd /root/repo
SF=${LEG_SF_DIR:-/root/repo/localdata/sf100}
CLASSES=${LEG_CLASSES:-target/leg-classes-r12}
PREFIX=${LEG_OUT_PREFIX:-BENCH_sf100_r12_chunk}
HEAP=${LEG_HEAP:-80g}

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

CHUNKS=$(python3 - <<'EOF'
import json
qs = sorted(json.load(open('CORRECTNESS_r11.json')).keys())
qs.remove('ml_ann_join')
# q_join_theta_range's OUTPUT is Theta(n^2) rows by definition (10.9e9
# rows ~ 300 GB through one global sort at sf100) -- it cannot
# materialize on one node at leg scale. The leg runs its bounded
# companion instead: the identical bucketized join reduced to a
# |nations|-row count+checksum (JoinOps.scala, oracle-gated).
qs.remove('q_join_theta_range')
qs.append('q_join_theta_range_agg')
qs.sort()
chunks = [qs[i:i+20] for i in range(0, len(qs), 20)]
chunks.append(['ml_ann_join'])
print('\n'.join(','.join(c) for c in chunks))
EOF
)

i=0
for chunk in $CHUNKS; do
  i=$((i+1))
  [ $i -lt ${1:-1} ] && continue
  export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  to=10800; case "$chunk" in ml_ann_join) to=18000;; esac
  echo "[leg] $(date +%H:%M:%S) chunk $i start: $chunk" >&2
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$chunk" \
    SPARK_GRAFT_BENCH_OUT="${PREFIX}${i}.json" \
    timeout $to java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx$HEAP \
      -cp "$CLASSES:/opt/spark/jars/*" graft.Bench \
      >"${PREFIX}${i}.out" 2>"${PREFIX}${i}.err"
  rc=$?
  echo "[leg] $(date +%H:%M:%S) chunk $i exit=$rc avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
done
rm -rf /root/repo/target/spark-leg-tmp
echo "[leg] done" >&2
