#!/usr/bin/env bash
# Multi-JVM correctness gate: run the FULL registry Verify under
# local-cluster (real separate executor JVMs — real task-result /
# broadcast / shuffle serialization, the coverage local[N] cannot give)
# and compare every entry against the DuckDB oracle with tools/check.py.
#
# Usage: bash tools/local_cluster_gate.sh [sfdir] [master]
#   sfdir  default /root/testdata/sf0.01 (the driver's gate scale)
#   master default local-cluster[2,8,2048]  (2 workers x 8 cores x 2 GiB)
#
# SPARK_HOME is faked into target/sparkhome (jars symlinked to the real
# distribution) because the standalone Worker puts executor work dirs
# under $SPARK_HOME/work and we must not write outside the repo.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
MASTER=${2:-local-cluster[2,8,2048]}
OUT=target/verify_lc

FAKE_HOME=$PWD/target/sparkhome
mkdir -p "$FAKE_HOME"
[ -e "$FAKE_HOME/jars" ] || ln -s "${SPARK_HOME:-/opt/spark}/jars" "$FAKE_HOME/jars"
rm -rf "$OUT" "$FAKE_HOME/work"

# SPARK_SCALA_VERSION: the launcher needs it to build the executor
# classpath when SPARK_HOME is not a full source build tree.
SPARK_HOME="$FAKE_HOME" \
SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER="$MASTER" \
SPARK_GRAFT_SHUFFLE=${SPARK_GRAFT_SHUFFLE:-32} \
  sbt -batch "runMain graft.Verify $SF $OUT"

python3 tools/check.py "$SF" "$OUT"
