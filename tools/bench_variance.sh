#!/usr/bin/env bash
# Drives graft.BenchVariance: one warm-JVM distribution (REPS executions in
# a single JVM) plus FRESH_RUNS single-execution fresh-JVM samples, for the
# queries given as arguments (default: q_agg_q1 q_agg_rollup).
# Output: the raw JSON lines, ready to paste into a BENCH_variance artifact.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
CPUS="${SPARK_GRAFT_CPUS:-32}"
REPS="${SPARK_GRAFT_REPS:-5}"
FRESH_RUNS="${FRESH_RUNS:-5}"
QUERIES="${*:-q_agg_q1 q_agg_rollup}"

echo "# warm-JVM: $REPS reps in one JVM"
SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_REPS="$REPS" \
  sbt -batch "runMain graft.BenchVariance $QUERIES" 2>/dev/null | grep '"metric":"variance"'

echo "# fresh-JVM: $FRESH_RUNS single-exec runs"
for _ in $(seq "$FRESH_RUNS"); do
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_REPS=1 \
    sbt -batch "runMain graft.BenchVariance $QUERIES" 2>/dev/null | grep '"metric":"variance"'
done
