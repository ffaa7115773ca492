#!/bin/bash
# Round-15 closing legs: FULL registry (175 queries) at sf0.1 and sf10,
# solo fresh JVMs, quiet box, frozen final classpath.
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
( while sleep 60; do
    echo "[disk] $(date +%H:%M:%S) avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
  done ) &
MON=$!
run_leg() { # $1=tag $2=sfdir
  echo "[leg] $(date +%H:%M:%S) $1 start load=$(cut -d' ' -f1 /proc/loadavg)" >&2
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$2 \
    SPARK_GRAFT_BENCH_OUT=BENCH_$1.json \
    timeout 14400 java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r15final:/opt/spark/jars/*" graft.Bench \
      >BENCH_$1.out 2>BENCH_$1.err
  echo "[leg] $(date +%H:%M:%S) $1 exit=$?" >&2
}
sleep 60
run_leg sf0.1_r15 /root/testdata/sf0.1
sleep 60
run_leg sf10_r15 /root/repo/localdata/sf10
kill $MON 2>/dev/null
rm -rf /root/repo/target/spark-leg-tmp
echo "[leg] all done" >&2
