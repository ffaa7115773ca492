#!/bin/bash
# Quiet re-measure: 60 s settle between legs (the r14 lesson: back-to-back
# legs contaminate via loadavg + page cache).
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
run_leg() {
  echo "[leg] $(date +%H:%M:%S) $1 ($2) start load=$(cut -d' ' -f1 /proc/loadavg)" >&2
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf10 \
    SPARK_GRAFT_ONLY=$2 SPARK_GRAFT_BENCH_OUT=BENCH_sf10_r15_$1.json \
    timeout 7200 java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r15:/opt/spark/jars/*" graft.Bench \
      >BENCH_sf10_r15_$1.out 2>BENCH_sf10_r15_$1.err
  echo "[leg] $(date +%H:%M:%S) $1 exit=$?" >&2
}
sleep 60
run_leg exact2 ml_ann_join
sleep 60
run_leg pqwarm2 ml_ann_join_pq
sleep 60
run_leg exact3 ml_ann_join
rm -rf /root/repo/target/spark-leg-tmp
echo "[leg] all done" >&2
