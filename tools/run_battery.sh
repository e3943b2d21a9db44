#!/bin/bash
# Full TPU measurement battery for round 4 — run when the axon endpoint
# recovers (tools/endpoint_watch.sh writes /tmp/tpu_up.sentinel).
# Sequential by design: probes claim most of the 16 GB HBM and the
# 1-core host slows 5-10x under contention (CLAUDE.md).  Most important
# measurements first in case the endpoint dies again.
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/battery_logs

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "tools/battery_logs/$name.log" 2>&1
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
}

run bench         2400 python bench.py
run int4numerics  2400 python tools/probe_int4_numerics.py
run int4agg       3600 python tools/probe_int4_agg.py
run continuous    2700 python tools/probe_continuous.py
run streamtrain   5400 python tools/run_stream_train_artifact.py
run decodemfu     2400 python tools/probe_decode_mfu.py
run kvint8        2400 python tools/probe_kv_int8.py
python tools/summarize_battery.py > tools/battery_logs/summary.json 2>/dev/null
echo "battery done $(date -u)"
