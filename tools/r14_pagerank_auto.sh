#!/bin/bash
# Round-14 A/B leg: q_graph_pagerank at AUTO shuffle partitions (320 from
# the input-proportional sizer) on the r14 classpath, whose pass loop now
# derives its OWN node-sized partition count (Sessions.iterShufflePartitions
# -> 32 at sf100's ~16M nodes). Done-criterion (r13 verdict #2): within
# ~10% of the @32 record (1,316.7 s) at <=25 GB peak spill. Also proves
# the Ranking scratch-leak fix holds at scale (pr-* dirs deleted; disk
# monitor shows no residual debt).
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
    echo "[disk] $(date +%H:%M:%S) avail=$(df --output=avail -BG / | tail -1 | tr -d ' ') spill=$(du -s --block-size=1G $SPARK_LOCAL_DIRS 2>/dev/null | cut -f1)G scratch=$(du -s --block-size=1G target/graft-scratch 2>/dev/null | cut -f1)G" >&2
  done ) &
MON=$!
echo "[pg-auto] $(date +%H:%M:%S) q_graph_pagerank start (r14 classes, auto parts)" >&2
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
  SPARK_GRAFT_ONLY=q_graph_pagerank SPARK_GRAFT_BENCH_OUT=BENCH_sf100_r14_pagerank_auto.json \
  timeout 10800 java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
    -cp "target/leg-classes-r14:/opt/spark/jars/*" graft.Bench \
    >BENCH_sf100_r14_pagerank_auto.out 2>BENCH_sf100_r14_pagerank_auto.err
echo "[pg-auto] $(date +%H:%M:%S) exit=$? avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
kill $MON 2>/dev/null
rm -rf /root/repo/target/spark-leg-tmp
ls target/graft-scratch 2>/dev/null | grep -c '^pr-' >&2 || true
echo "[pg-auto] done" >&2
