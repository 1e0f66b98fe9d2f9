#!/bin/bash
# Recovery loop for the single-client axon tunnel (docs/TPU_NOTES.md, memory:
# tpu-tunnel-quirks): after an orphaned remote compile, new claims bounce
# UNAVAILABLE for a while. Poll with bounded claim attempts, sleep between,
# and run the serial work queue the moment a claim succeeds.
# Usage: nohup bash scripts/tpu_wait_and_queue.sh [queue.sh] > /tmp/tpu_wait.log 2>&1 &
set -u
cd /root/repo
QUEUE=${1:-scripts/r4_tpu_queue.sh}
for attempt in $(seq 1 40); do
  echo "=== claim attempt $attempt $(date +%T) ==="
  timeout 600 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); d=jax.devices(); print('devices', d, f'{time.time()-t0:.1f}s', flush=True)
x=jnp.ones((256,256)); y=(x@x).block_until_ready()
print('CLAIM OK', f'{time.time()-t0:.1f}s total', flush=True)
" && { echo "tunnel alive; running $QUEUE"; bash "$QUEUE"; exit $?; }
  echo "attempt $attempt failed rc=$?; sleeping 180s"
  sleep 180
done
echo "GAVE UP after 40 attempts"
exit 1
