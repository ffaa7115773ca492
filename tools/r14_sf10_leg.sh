#!/bin/bash
# Round-14 closing leg: FULL 174-query registry at sf10 on final r14 code.
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
echo "[sf10] $(date +%H:%M:%S) start" >&2
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf10 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10_r14.json \
  timeout 10800 java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
    -cp "target/leg-classes-r14:/opt/spark/jars/*" graft.Bench \
    >BENCH_sf10_r14.out 2>BENCH_sf10_r14.err
echo "[sf10] $(date +%H:%M:%S) exit=$?" >&2
rm -rf /root/repo/target/spark-leg-tmp
echo "[sf10] done" >&2
