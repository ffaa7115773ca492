#!/bin/bash
# Round-15 IVF×PQ measurement (r14 verdict #3): sf10, fresh JVMs, solo.
# Leg 1 pays the cold IVF build (ml_ann_build); leg 2 = exact ml_ann_join
# warm; leg 3 = ml_ann_join_pq cold (codebook fit + pqcodes sidecar in
# wall); leg 4 = ml_ann_join_pq warm (the honest query-side number).
set -u
cd /root/repo
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
( while sleep 30; do
    echo "[disk] $(date +%H:%M:%S) avail=$(df --output=avail -BG / | tail -1 | tr -d ' ') spill=$(du -s --block-size=1G $SPARK_LOCAL_DIRS 2>/dev/null | cut -f1)G" >&2
  done ) &
MON=$!
run_leg() { # $1=tag $2=query
  echo "[leg] $(date +%H:%M:%S) $1 ($2) start" >&2
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf10 \
    SPARK_GRAFT_ONLY=$2 SPARK_GRAFT_BENCH_OUT=BENCH_sf10_r15_$1.json \
    timeout 7200 java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r15:/opt/spark/jars/*" graft.Bench \
      >BENCH_sf10_r15_$1.out 2>BENCH_sf10_r15_$1.err
  echo "[leg] $(date +%H:%M:%S) $1 exit=$?" >&2
}
run_leg build ml_ann_build
run_leg exact ml_ann_join
run_leg pqcold ml_ann_join_pq
run_leg pqwarm ml_ann_join_pq
kill $MON 2>/dev/null
rm -rf /root/repo/target/spark-leg-tmp
echo "[leg] all done" >&2
