#!/bin/bash
# Placement experiment: is hypervisor preemption biased toward specific
# vCPU ranges? Runs the SAME 16-core BenchBuildHalf back-to-back on the
# lower (0-15) and upper (16-31) halves of the box, several reps, and
# prints each child's GRAFT_HALF line tagged with its cpuset. A
# consistent docsPerSec/cpuSec gap between placements means the scaling
# pair should prefer the cleaner range.
#
# Usage: tools/cpuset_probe.sh [reps] [nDocs] [corpusDir] [corpusDocs]
set -u
REPS=${1:-3}
NDOCS=${2:-400000}
CORPUS=${3:-/tmp/graft_bench_corpus_1200000}
CORPUSDOCS=${4:-1200000}
CP=$(ls /root/repo/target/scala-2.13/classes >/dev/null && echo \
  "/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')$(find /root/.cache/coursier -name 'scala-library-2.13*.jar' | head -1)")
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
for rep in $(seq 1 "$REPS"); do
  for SET in 0-15 16-31; do
    LINE=$(taskset -c "$SET" java $OPENS -Xmx16g \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.BenchBuildHalf 16 "$NDOCS" "$CORPUS" "$CORPUSDOCS" 100000 \
      2>/dev/null | grep GRAFT_HALF)
    echo "rep=$rep cpuset=$SET $LINE"
  done
done
