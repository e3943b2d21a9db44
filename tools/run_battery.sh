#!/bin/bash
# Full TPU measurement battery (round 5) — run when the axon endpoint is
# up (tools/endpoint_watch.sh writes /tmp/tpu_up.sentinel on recovery).
# Sequential by design: probes claim most of the 16 GB HBM and the
# 1-core host slows 5-10x under contention (CLAUDE.md).  Most important
# measurements first in case the endpoint dies again.
#
# ROUND-END HYGIENE (round-4 lesson: the battery's streamtrain overlapped
# the driver's bench and starved it — BENCH_r04 rc=124): this script
# traps EXIT to kill its own process group's children, refuses to START
# a probe once BATTERY_DEADLINE (epoch seconds, optional) has passed, and
# ends by waiting for the chip queue to drain.  To stop a running battery
# cleanly: kill -- -$(cat /tmp/battery.pid).
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/battery_logs
echo $$ > /tmp/battery.pid

CHILD=0
cleanup() {
  [ "$CHILD" != 0 ] && kill "$CHILD" 2>/dev/null
  wait 2>/dev/null
  rm -f /tmp/battery.pid
}
trap cleanup EXIT

past_deadline() {
  [ -n "${BATTERY_DEADLINE:-}" ] && [ "$(date +%s)" -ge "$BATTERY_DEADLINE" ]
}

run() {
  local name=$1 tmo=$2; shift 2
  if past_deadline; then
    echo "=== $name SKIPPED (past BATTERY_DEADLINE) $(date -u +%H:%M:%S)"
    return
  fi
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "tools/battery_logs/$name.log" 2>&1 &
  CHILD=$!
  wait "$CHILD"
  echo "=== $name rc=$? end $(date -u +%H:%M:%S)"
  CHILD=0
}

run bench         2400 python bench.py
run gmm           1800 python tools/probe_gmm.py
run speculative   2400 python tools/probe_speculative_tpu.py
run decodemfu     2400 python tools/probe_decode_mfu.py --int4
run int4agg       3600 python tools/probe_int4_agg.py
run continuous    2700 python tools/probe_continuous.py
run kvint8        2400 python tools/probe_kv_int8.py
run streamtrain   5400 python tools/run_stream_train_artifact.py
python tools/summarize_battery.py > tools/battery_logs/summary.json 2>/dev/null

# Queue drain: one tiny op through the chip proves no server-side backlog
# is left behind for the next client (the driver's bench).
timeout 300 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
print("queue drained, chip idle")
EOF
echo "battery done $(date -u)"
