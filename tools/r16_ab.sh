#!/bin/bash
# Round-16 A/B forensics, solo fresh JVMs, quiet box:
#   1. ml_ann_join + ml_ann_join_pq SOLO at sf10 (is the residual path
#      itself regressed vs r15's 102.3 / 91.7 in-leg pair?)
#   2. sf1 full leg, ALPHABETICAL order (the r15 control)
#   3. sf1 full leg, hash order (the r16 default)
# 2 vs 3 separates box drift from order effects; both share warm artifacts.
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
JAVA="java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g -cp target/leg-classes-r16b:/opt/spark/jars/*"
log() { echo "[ab] $(date +%H:%M:%S) $* load=$(cut -d' ' -f1 /proc/loadavg)" >&2; }

sleep 90  # let the box settle
log "ann solo pair start"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf10 \
  SPARK_GRAFT_ONLY=ml_ann_join,ml_ann_join_pq \
  SPARK_GRAFT_BENCH_OUT=BENCH_r16_annsolo.json \
  timeout 7200 $JAVA graft.Bench >BENCH_r16_annsolo.out 2>BENCH_r16_annsolo.err
log "ann solo exit=$?"
sleep 120
log "sf1 alpha leg start"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf1 \
  SPARK_GRAFT_BENCH_SEED=alpha \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1_r16_alpha.json \
  timeout 14400 $JAVA graft.Bench >BENCH_sf1_r16_alpha.out 2>BENCH_sf1_r16_alpha.err
log "sf1 alpha exit=$?"
sleep 120
log "sf1 hash leg start"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf1 \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1_r16_hash.json \
  timeout 14400 $JAVA graft.Bench >BENCH_sf1_r16_hash.out 2>BENCH_sf1_r16_hash.err
log "sf1 hash exit=$?"
rm -rf /root/repo/target/spark-leg-tmp
log "ab done"
