#!/bin/bash
# One ballasted pinned trial: $1=cores $2=table $3=outdir
# Spinners occupy the unused cores so every trial runs at all-core clock.
set -u
CORES=$1; TABLE=$2; OUT=$3; TOTAL=32
CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
BALPID=""
if [ "$CORES" -lt "$TOTAL" ]; then
  K=$((TOTAL-CORES))
  taskset -c ${CORES}-$((TOTAL-1)) bash -c \
    "for i in \$(seq 1 $K); do yes > /dev/null & done; wait" &
  BALPID=$!
  sleep 1
fi
taskset -c 0-$((CORES-1)) java $AO -Xmx8g -cp "$CP" \
  graft.BenchWorker "$TABLE" "$OUT" "$CORES" "${4:-salted}" 2>/dev/null | grep BENCH_SECONDS
if [ -n "$BALPID" ]; then
  kill "$BALPID" 2>/dev/null
  ps ax -o pid,comm | awk '$2=="yes"{print $1}' | xargs -r kill -9
fi
