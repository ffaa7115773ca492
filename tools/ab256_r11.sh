#!/bin/bash
# Round-11 follow-up: A/B the top NON-design-quadratic sf100/sf10 ratio
# offenders (q_join_q9 38.9x, q_join_q8 22.4x, q_agg_rollup 18.6x,
# q_cdc_scd2 16.7x, q_join_q19 15.6x; linear would be 10x) solo in fresh
# JVMs at 256 vs 32 shuffle partitions — the q_subq_q21 hypothesis: at 32
# partitions each SMJ sort holds input/32 per slot x 32 slots = the WHOLE
# input as simultaneous spill; 256 partitions cut simultaneous spill 8x
# and shorten each sort run.
set -u
cd /root/repo
QS="q_join_q9,q_join_q8,q_agg_rollup,q_cdc_scd2,q_join_q19"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for parts in 256 32; do
  export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
    SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_SHUFFLE_PARTITIONS=$parts \
    SPARK_GRAFT_BENCH_OUT="BENCH_sf100_ab${parts}_r11.json" \
    timeout 7200 java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r11:/opt/spark/jars/*" graft.Bench \
      >"BENCH_sf100_ab${parts}_r11.out" 2>"BENCH_sf100_ab${parts}_r11.errlog"
  echo "[ab] parts=$parts exit=$? avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')"
done
rm -rf /root/repo/target/spark-leg-tmp
