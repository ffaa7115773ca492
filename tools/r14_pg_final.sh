#!/bin/bash
# Round-14 pagerank A/B, instrumented (stderr phase marks): leg A = auto
# (build at 320 input-sized, passes at node-sized 32); leg B = global 32
# (the r13 record's configuration), SAME DAY so ambient conditions match.
set -u
cd /root/repo
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_leg() {
  local name=$1; shift
  export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  ( while sleep 30; do
      echo "[disk-$name] $(date +%H:%M:%S) avail=$(df --output=avail -BG / | tail -1 | tr -d ' ') spill=$(du -s --block-size=1G $SPARK_LOCAL_DIRS 2>/dev/null | cut -f1)G" >&2
    done ) &
  local MON=$!
  echo "[$name] $(date +%H:%M:%S) start" >&2
  env "$@" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
    SPARK_GRAFT_ONLY=q_graph_pagerank SPARK_GRAFT_BENCH_OUT=BENCH_sf100_r14_$name.json \
    timeout 10800 java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r14:/opt/spark/jars/*" graft.Bench \
      >BENCH_sf100_r14_$name.out 2>BENCH_sf100_r14_$name.err
  echo "[$name] $(date +%H:%M:%S) exit=$?" >&2
  kill $MON 2>/dev/null
  rm -rf /root/repo/target/spark-leg-tmp
}
run_leg pg_final
echo "[ab2] done" >&2
