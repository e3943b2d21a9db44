#!/bin/bash
# Retry watcher for the axon TPU endpoint (CLAUDE.md playbook).
# Probes every 5 min; writes /tmp/tpu_up.sentinel when a backend init succeeds.
rm -f /tmp/tpu_up.sentinel /tmp/tpu_watch.log
while true; do
  if timeout 1500 python -c "import jax; d=jax.devices(); assert d; import jax.numpy as jnp; print(float(jnp.ones(4).sum()))" >> /tmp/tpu_watch.log 2>&1; then
    date > /tmp/tpu_up.sentinel
    echo "UP $(date)" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "retry $(date)" >> /tmp/tpu_watch.log
  sleep 300
done
