#!/bin/bash
# Round-13: C side of the pagerank A/B — 320 auto-sized partitions, the
# EXACT configuration that ENOSPC'd solo on r12-state code (chunk 11),
# now on the r13 classpath whose pagerank materializes loop invariants
# with localCheckpoint (build-shuffle lineage truncated). Completion
# here proves the fix removes the pinned-shuffle debt rather than
# dodging it via partition count.
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
echo "[fix320] $(date +%H:%M:%S) q_graph_pagerank start (r13 classes, 320 parts)" >&2
SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
  SPARK_GRAFT_ONLY=q_graph_pagerank SPARK_GRAFT_BENCH_OUT=BENCH_sf100_r13_pagerank320.json \
  timeout 10800 java $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
    -cp "target/leg-classes-r13:/opt/spark/jars/*" graft.Bench \
    >BENCH_sf100_r13_pagerank320.out 2>BENCH_sf100_r13_pagerank320.err
echo "[fix320] $(date +%H:%M:%S) exit=$? avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
kill $MON 2>/dev/null
rm -rf /root/repo/target/spark-leg-tmp
echo "[fix320] done" >&2
