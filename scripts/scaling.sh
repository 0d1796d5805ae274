#!/bin/bash
# Two-cluster-size scaling evidence: ALTERNATING series, each leg in its
# own JVM (fresh "executor set"), medians reported.
#
# Each N-core leg is pinned to EXACTLY N CPUs (taskset 0..N-1) with
# -XX:ActiveProcessorCount=N, so the JVM's GC/thread pools are sized for an
# N-core box: without this, a local[8] leg's ~23 G1 GC threads silently use
# all 32 host CPUs, making the small leg unfairly fast and deflating the
# measured N->4N efficiency (a real 8-core executor would not get free GC
# cores from the 32-core cluster).
#
# usage: scripts/scaling.sh [urls] [docScale] [nSmall] [nBig] [reps]
# env:   CORPUS=/path/to/pages reuses an existing generated corpus.
set -e
cd "$(dirname "$0")/.."
URLS=${1:-300000}; DS=${2:-24}; NS=${3:-8}; NB=${4:-32}; REPS=${5:-3}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
if [ -n "$CORPUS" ]; then
  DIR="$CORPUS"; CLEAN=""
  # count the ACTUAL corpus (a urls-derived count misreports pages/sec when
  # the on-disk corpus was generated with different parameters)
  PAGES=$(sbt -batch "runMain graft.ScalingBench count $DIR" 2>/dev/null | grep -o '"rows":[0-9]*' | cut -d: -f2)
else
  DIR=$(mktemp -d)/pages; CLEAN="$(dirname "$DIR")"
  gen_out=$(sbt -batch "runMain graft.ScalingBench gen $URLS $DS $DIR" 2>/dev/null | grep -o '{"generated":[0-9]*[^}]*}')
  PAGES=$(echo "$gen_out" | grep -o '"generated":[0-9]*' | cut -d: -f2)
fi
echo "corpus: $PAGES pages at $DIR"
leg() { # leg <cores>
  local n=$1 last
  last=$((n - 1))
  SPARK_GRAFT_EXTRA_JAVA_OPTS="-XX:ActiveProcessorCount=$n ${SPARK_GRAFT_EXTRA_JAVA_OPTS:-}" \
    taskset -c 0-$last sbt -batch "runMain graft.ScalingBench run $n $DIR" 2>/dev/null \
    | grep -o '{"cores":[^}]*}'
}
TS=""; TB=""
for i in $(seq 1 "$REPS"); do
  small=$(leg "$NS"); echo "$small"
  TS="$TS,$(echo "$small" | grep -o '"sec":[0-9.]*' | cut -d: -f2)"
  big=$(leg "$NB"); echo "$big"
  TB="$TB,$(echo "$big" | grep -o '"sec":[0-9.]*' | cut -d: -f2)"
done
TS=${TS#,}; TB=${TB#,}
sbt -batch "runMain graft.ScalingBench report $PAGES $NS $TS $NB $TB" 2>/dev/null | grep -o '{"pages":[^}]*}'
[ -n "$CLEAN" ] && rm -rf "$CLEAN" || true
