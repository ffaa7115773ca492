#!/bin/bash
# Round-14 ml_ann_join re-measure (r13 verdict #7 / watch #2): fresh JVM,
# quiet box, auto partitions — is the r13 +18% vs r11 persistent? The ANN
# index memo is keyed on corpus content fingerprint; the corpus carried
# over from r13 unchanged, so the index should be WARM (no cold build in
# wall) unless scratch was wiped (it was not this round).
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
echo "[ann] $(date +%H:%M:%S) ml_ann_join start (r14 classes, auto parts)" >&2
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
  SPARK_GRAFT_ONLY=ml_ann_join SPARK_GRAFT_BENCH_OUT=BENCH_sf100_r14_ann.json \
  timeout 14400 java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
    -cp "target/leg-classes-r14:/opt/spark/jars/*" graft.Bench \
    >BENCH_sf100_r14_ann.out 2>BENCH_sf100_r14_ann.err
echo "[ann] $(date +%H:%M:%S) exit=$? avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
kill $MON 2>/dev/null
rm -rf /root/repo/target/spark-leg-tmp
echo "[ann] done" >&2
