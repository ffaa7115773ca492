#!/bin/bash
# Round-16 measurement legs, solo fresh JVMs on a quiet box, frozen
# classpath (target/leg-classes-r16), hash-ordered bench (the new
# de-alphabetized runner):
#   1. warm sf10 artifacts (regenerated localdata => new fingerprints:
#      index build, residual codebook, pqcodes — untimed)
#   2. ml_pq_encode SOLO at sf10 (r15 verdict wrong #2: 29.8 s in-leg vs
#      11.7 s r14 — settle it)
#   3. IVF×PQ wall at sf10, nprobe 16 vs 28 (the residual/byte-budget
#      operating points; index warm from step 1)
#   4. full-registry legs: sf0.1, sf1, sf10
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
CP="target/leg-classes-r16:/opt/spark/jars/*"
JAVA="java $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g -cp $CP"

log() { echo "[leg] $(date +%H:%M:%S) $* load=$(cut -d' ' -f1 /proc/loadavg)" >&2; }

# 1. warm sf10 artifacts (index + residual codebook + codes), untimed
log "warm sf10 artifacts start"
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PQ_WALL_DIR=/root/repo/localdata/sf10 \
  SPARK_GRAFT_PQ_GRID=16 \
  timeout 7200 $JAVA graft.PqResidualProbe >LEG_r16_warm.out 2>LEG_r16_warm.err
log "warm exit=$?"
sleep 30

# 2. ml_pq_encode solo x3 (fresh JVM each; codebook now persisted, so
#    these time the steady-state encode, the r14-comparable number)
for i in 1 2 3; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf10 \
    SPARK_GRAFT_ONLY=ml_pq_encode \
    SPARK_GRAFT_BENCH_OUT=BENCH_r16_pqencode_solo$i.json \
    timeout 3600 $JAVA graft.Bench >BENCH_r16_pqencode_solo$i.out 2>BENCH_r16_pqencode_solo$i.err
  log "pq_encode solo$i exit=$?"
  sleep 15
done

# 3. IVF×PQ sf10 wall at nprobe 16 and 28 (warm index, one JVM per grid
#    so the two points don't share GC debris)
for np in 16 28; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PQ_WALL_DIR=/root/repo/localdata/sf10 \
    SPARK_GRAFT_PQ_GRID=$np \
    timeout 7200 $JAVA graft.PqResidualProbe >LEG_r16_pqwall_np$np.out 2>LEG_r16_pqwall_np$np.err
  log "pqwall np$np exit=$?"
  sleep 15
done

# 4. full-registry legs
run_leg() { # $1=tag $2=sfdir
  log "$1 start"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$2 \
    SPARK_GRAFT_BENCH_OUT=BENCH_$1.json \
    timeout 14400 $JAVA graft.Bench >BENCH_$1.out 2>BENCH_$1.err
  log "$1 exit=$?"
}
run_leg sf0.1_r16 /root/testdata/sf0.1
sleep 60
run_leg sf1_r16 /root/repo/localdata/sf1
sleep 60
run_leg sf10_r16 /root/repo/localdata/sf10
rm -rf /root/repo/target/spark-leg-tmp
log "all done"
