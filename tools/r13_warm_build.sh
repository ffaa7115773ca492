#!/bin/bash
# Round-13: the ml_ann_build warm-second-run proof at sf100 (r12 verdict
# item 2). Runs AFTER the tails leg: ml_ann_join (chunk 22) cold-builds
# the persisted index via ensureIndex inside its wall; this fresh JVM
# then runs ml_ann_build against the SAME corpus — the cross-JVM memo
# (fingerprint -> _SUCCESS markers) must serve it at memo speed, not
# refit the 2M-vector quantizer.
set -u
cd /root/repo
while pgrep -f r13_tails.sh >/dev/null; do sleep 30; done
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
echo "[warm] $(date +%H:%M:%S) ml_ann_build warm start" >&2
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
  SPARK_GRAFT_ONLY=ml_ann_build SPARK_GRAFT_BENCH_OUT=BENCH_sf100_r12_chunk23.json \
  timeout 3600 java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
    -cp "target/leg-classes-r12:/opt/spark/jars/*" graft.Bench \
    >BENCH_sf100_r12_chunk23.out 2>BENCH_sf100_r12_chunk23.err
echo "[warm] $(date +%H:%M:%S) exit=$? avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
rm -rf /root/repo/target/spark-leg-tmp
echo "[warm] done" >&2
