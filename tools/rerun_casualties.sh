#!/bin/bash
# Waits for the sf100 leg to finish, then re-runs the two in-chunk ENOSPC
# casualties solo in fresh JVMs with clean leg-private spill dirs. Their
# outputs land as chunk11/chunk12 so tools/merge_chunks.py overrides the
# -1 sentinels (later chunks win).
set -u
cd /root/repo
while pgrep -f sf100_leg.sh >/dev/null; do sleep 30; done
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
i=10
for q in q_join_theta_range q_subq_q21; do
  i=$((i+1))
  export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  echo "[rerun] $(date +%H:%M:%S) $q start" >&2
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
    SPARK_GRAFT_ONLY="$q" SPARK_GRAFT_BENCH_OUT="BENCH_sf100_r11_chunk${i}.json" \
    timeout 10800 java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r11:/opt/spark/jars/*" graft.Bench \
      >"BENCH_sf100_r11_chunk${i}.out" 2>"BENCH_sf100_r11_chunk${i}.err"
  echo "[rerun] $(date +%H:%M:%S) $q exit=$? avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
done
rm -rf /root/repo/target/spark-leg-tmp
echo "[rerun] done" >&2
