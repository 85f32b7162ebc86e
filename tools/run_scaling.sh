#!/usr/bin/env bash
# North-rule scaling evidence (BASELINE.json): the SAME upsert-apply job on
# the SAME input, run via spark-submit at two parallelism levels (N and 4N
# cores standing in for N and 4N executors). Each level runs in a FRESH JVM
# hard-contained to its core budget (taskset + ActiveProcessorCount), so GC
# and runtime threads can't borrow cores the level doesn't own — the honest
# single-box emulation of an N-core executor.
#
# Usage: tools/run_scaling.sh [N] [events] [batches] [mode] [rounds] [updateShare]
# updateShare > 0 switches to the UPDATE-phase workload: prebuild (1-share)
# of the WAL untimed, then time the small update batches (the DV design
# point: big table, small change batches).
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:-2}"; EVENTS="${2:-16000000}"; BATCHES="${3:-4}"; MODE="${4:-mor}"; ROUNDS="${5:-3}"; SHARE="${6:-0}"; REPS="${7:-8}"
HIGH=$((N * 4))
JAR=$(ls target/scala-2.13/*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then sbt -batch package >/dev/null; JAR=$(ls target/scala-2.13/*.jar | head -1); fi

run_level() { # cores -> throughput (ev/s)
  local CORES=$1
  # SCALING_EXTRA_CONF: optional space-separated k=v spark confs (A/B knobs)
  local EXTRA=()
  for kv in ${SCALING_EXTRA_CONF:-}; do EXTRA+=(--conf "$kv"); done
  taskset -c 0-$((CORES - 1)) /opt/spark/bin/spark-submit \
    --master "local[$CORES]" \
    --driver-memory "${SCALING_MEM:-32g}" \
    --conf spark.driver.extraJavaOptions="-XX:ActiveProcessorCount=$CORES -XX:+UseParallelGC" \
    --conf spark.sql.shuffle.partitions="$CORES" \
    --conf spark.ui.enabled=false \
    "${EXTRA[@]}" \
    --class graft.BenchScaling "$JAR" single "$CORES" "$EVENTS" "$BATCHES" "$MODE" "$SHARE" "$REPS" 2>/dev/null \
    | awk '/^SCALING_THR/ {print $3}'
}

LOWS=(); HIGHS=()
for r in $(seq 1 "$ROUNDS"); do
  TL=$(run_level "$N");    echo "round $r: local[$N]  -> $TL ev/s" >&2
  TH=$(run_level "$HIGH"); echo "round $r: local[$HIGH] -> $TH ev/s" >&2
  LOWS+=("$TL"); HIGHS+=("$TH")
done

python3 - "$N" "$HIGH" "$EVENTS" "$BATCHES" "$MODE@share=$SHARE,reps=$REPS" "${LOWS[@]}" -- "${HIGHS[@]}" <<'EOF'
import sys, statistics
n, high, events, batches, mode = sys.argv[1:6]
rest = sys.argv[6:]
sep = rest.index('--')
lows = [float(x) for x in rest[:sep]]
highs = [float(x) for x in rest[sep+1:]]
ml, mh = statistics.median(lows), statistics.median(highs)
eff = (mh / ml) / (int(high) // int(n))
report = f"""
## Scaling run (mode={mode}, events={events}, batches={batches}, spark-submit, taskset-pinned cores, fresh JVM per level)

| parallelism | runs (change-events/s) | median |
|---|---|---|
| local[{n}] (N) | {', '.join(f'{x:.0f}' for x in lows)} | {ml:.0f} |
| local[{high}] (4N) | {', '.join(f'{x:.0f}' for x in highs)} | {mh:.0f} |

**Scaling efficiency (median_4N / median_N) / 4 = {eff:.3f}** (target >= 0.8 per BASELINE.json)
Reference floor: ~330 features/s single-thread (BASELINE.md) -> {mh/330:.0f}x at 4N.
"""
print(report)
try:
    prev = open('BENCH.md').read()
except FileNotFoundError:
    prev = '# BENCH — measured engine throughput + scaling\n'
open('BENCH.md', 'w').write(prev + report)
EOF