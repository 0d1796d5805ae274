#!/bin/bash
# Two-cluster-size scaling evidence: each leg in its own JVM.
# usage: scripts/scaling.sh [urls] [docScale] [nSmall] [nBig]
set -e
cd "$(dirname "$0")/.."
URLS=${1:-50000}; DS=${2:-24}; NS=${3:-8}; NB=${4:-32}
DIR=$(mktemp -d)/pages
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
gen_out=$(sbt -batch "runMain graft.ScalingBench gen $URLS $DS $DIR" 2>/dev/null | grep -o '{"generated":[0-9]*[^}]*}')
PAGES=$(echo "$gen_out" | grep -o '"generated":[0-9]*' | cut -d: -f2)
echo "generated $PAGES pages at $DIR"
small=$(sbt -batch "runMain graft.ScalingBench run $NS $DIR" 2>/dev/null | grep -o '{"cores":[^}]*}')
echo "$small"
big=$(sbt -batch "runMain graft.ScalingBench run $NB $DIR" 2>/dev/null | grep -o '{"cores":[^}]*}')
echo "$big"
TS=$(echo "$small" | grep -o '"sec":[0-9.]*' | cut -d: -f2)
TB=$(echo "$big" | grep -o '"sec":[0-9.]*' | cut -d: -f2)
sbt -batch "runMain graft.ScalingBench report $PAGES $NS $TS $NB $TB" 2>/dev/null | grep -o '{"pages":[^}]*}'
rm -rf "$(dirname "$DIR")"
