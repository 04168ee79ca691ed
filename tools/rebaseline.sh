#!/bin/bash
# Round-6 re-baseline: run the full bench 3x at sf0.1 under the forked
# harness (fresh JVM each, same flags build.sbt forks with), then
# isolated fresh-JVM runs of the three queries that measured >2x in
# r4/r5 (tpch_q5/q6/q7). Outputs land in target/rebaseline/.
set -u
cd /root/repo
OUT=target/rebaseline
mkdir -p "$OUT"
CP="target/scala-2.13/veraxspark_2.13-0.1.0.jar:/opt/spark/jars/*"
OPTS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
OPTS="$OPTS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx8g"

run_bench() { # $1=tag $2=only-regex(optional)
  local tag="$1" only="${2:-}"
  if [ -n "$only" ]; then
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_ONLY="$only" \
      java $OPTS -cp "$CP" graft.Bench > "$OUT/$tag.json" 2> "$OUT/$tag.log"
  else
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      java $OPTS -cp "$CP" graft.Bench > "$OUT/$tag.json" 2> "$OUT/$tag.log"
    cp target/bench_full.json "$OUT/${tag}_full.json"
  fi
  echo "[rebaseline] done $tag"
}

for i in 1 2 3; do run_bench "full_$i"; done
for q in 5 6 7; do
  for i in 1 2 3; do run_bench "iso_q${q}_$i" "^tpch_q${q}\$"; done
done
echo "[rebaseline] ALL DONE"
