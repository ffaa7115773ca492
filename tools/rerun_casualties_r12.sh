#!/bin/bash
# Round-12: re-run the chunk-4 ENOSPC casualties solo in fresh JVMs with
# clean leg-private spill dirs (pagerank's in-JVM spill debt filled the
# 61 GB free mid-chunk and took the next three queries with it — the
# bounded-per-chunk cascade the protocol anticipates). Outputs land as
# chunk11+ so tools/merge_chunks.py overrides the -1 sentinels (later
# chunks win). Pagerank runs FIRST and, if it ENOSPCs solo too, is
# retried at 32 shuffle partitions — the A/B that decides whether the
# r12 input-proportional sizing (320 at sf100) inflates its per-pass
# checkpoint/shuffle footprint.
set -u
cd /root/repo
while pgrep -f sf100_leg.sh >/dev/null; do sleep 30; done
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() { # $1 = query, $2 = chunk index, $3 = extra env (optional VAR=VAL)
  export SPARK_LOCAL_DIRS=/root/repo/target/spark-leg-tmp
  rm -rf "$SPARK_LOCAL_DIRS"; mkdir -p "$SPARK_LOCAL_DIRS"
  echo "[rerun] $(date +%H:%M:%S) $1 start ${3:-}" >&2
  env ${3:-SPARK_GRAFT_NOOP_=1} \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/repo/localdata/sf100 \
    SPARK_GRAFT_ONLY="$1" SPARK_GRAFT_BENCH_OUT="BENCH_sf100_r12_chunk${2}.json" \
    timeout 10800 java $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx80g \
      -cp "target/leg-classes-r12:/opt/spark/jars/*" graft.Bench \
      >"BENCH_sf100_r12_chunk${2}.out" 2>"BENCH_sf100_r12_chunk${2}.err"
  local rc=$?
  echo "[rerun] $(date +%H:%M:%S) $1 exit=$rc avail=$(df --output=avail -BG / | tail -1 | tr -d ' ')" >&2
  return $rc
}
run_one q_graph_pagerank 11
if grep -q '"q_graph_pagerank":-1' BENCH_sf100_r12_chunk11.json 2>/dev/null || \
   [ ! -s BENCH_sf100_r12_chunk11.json ]; then
  # Solo ENOSPC: A/B at the r11 partition count (the only r11->r12 change
  # in this query's execution environment).
  run_one q_graph_pagerank 15 SPARK_GRAFT_SHUFFLE_PARTITIONS=32
fi
run_one q_graph_triangles 12
run_one q_having_corr_grouped 13
run_one q_join_5way 14
rm -rf /root/repo/target/spark-leg-tmp
echo "[rerun] done" >&2
