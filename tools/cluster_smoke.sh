#!/usr/bin/env bash
# Multi-JVM smoke: runs graft.ClusterSmoke under local-cluster[2,4,4096]
# (2 executor JVMs x 4 cores x 4 GiB) — proves executor-side class-name
# resolution (FileShardService), broadcast transport, codegen'd custom
# expressions, kernel closure serialization, and checkpointed stream
# resume across separate processes. See ClusterSmoke.scala.
#
# Usage: tools/cluster_smoke.sh   (from /root/repo; needs SPARK_HOME)
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile > /dev/null
# the standalone-worker executor launcher infers the Scala version from
# SPARK_HOME build dirs, which a jars-only install lacks — pin it
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
SPARK_GRAFT_MASTER="${SPARK_GRAFT_MASTER:-local-cluster[2,4,4096]}" \
  sbt -batch "runMain graft.ClusterSmoke" 2>&1 | tee /tmp/cluster_smoke.log \
  | grep "CLUSTER-SMOKE" || true
grep -q "CLUSTER-SMOKE ok=true" /tmp/cluster_smoke.log
echo "cluster smoke: PASS"
