#!/bin/bash
# Round-13: solo re-measures on a quiet box for the r12 sf100 tails the
# verdict flagged as load-contaminated (chunks 1-3 ran concurrent with
# sbt dev work in r12), plus the q_subq_q11 320-vs-32 partition A/B
# (its chunk was clean, so auto-sized partitions are the only changed
# variable), plus ml_ann_join under the r12 environment (auto partitions
# + periodicGC changed its envelope; the 1,902.8 s record is r11's).
# Runs on the FROZEN r12-state classpath so the r13 dev edits cannot
# contaminate attribution. Fresh JVM + wiped leg-private spill per query.
set -u
cd /root/repo
while pgrep -f rerun_casualties_r12.sh >/dev/null; do sleep 30; done
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() { # $1 = query, $2 = chunk index, $3 = timeout, $4 = extra env
  export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  echo "[tails] $(date +%H:%M:%S) $1 start ${4:-}" >&2
  env ${4:-SPARK_GRAFT_NOOP_=1} \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
    SPARK_GRAFT_ONLY="$1" SPARK_GRAFT_BENCH_OUT="BENCH_sf100_r12_chunk${2}.json" \
    timeout "$3" java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r12:/opt/spark/jars/*" graft.Bench \
      >"BENCH_sf100_r12_chunk${2}.out" 2>"BENCH_sf100_r12_chunk${2}.err"
  echo "[tails] $(date +%H:%M:%S) $1 exit=$? avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
}
run_one q_agg_q14            16 3600
run_one q_agg_hll_merge      17 3600
run_one q_dedup_cross_source 18 3600
run_one dedup_clusters       19 3600
run_one q_subq_q11           20 3600
run_one q_subq_q11           21 3600 SPARK_GRAFT_SHUFFLE_PARTITIONS=32
run_one ml_ann_join          22 18000
rm -rf /root/repo/target/spark-leg-tmp
echo "[tails] done" >&2
