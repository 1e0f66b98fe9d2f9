#!/bin/bash
# PATIENT recovery loop for a hard-wedged axon tunnel.
#
# The fast loop (tpu_wait_and_queue.sh: 600 s claim timeout, 180 s sleep) can
# be a self-sustaining death spiral after a bad wedge: each timed-out claim is
# itself a killed client, and a killed client re-wedges the next init for
# 15-40 min (docs/TPU_NOTES.md "axon tunnel behaviors") — so probing every
# ~13 min can keep the tunnel wedged forever. This variant makes FEW attempts
# with a claim timeout LONGER than the documented worst-case recovery (40 min)
# and long quiet gaps between attempts, so a single attempt can sit through
# the entire wedge-recovery window without being killed mid-init.
#
# Usage: nohup bash scripts/tpu_patient_queue.sh [queue.sh] > /tmp/tpu_patient.log 2>&1 &
set -u
cd /root/repo
QUEUE=${1:-scripts/r4_tpu_queue.sh}
CLAIM_TIMEOUT=${TPU_CLAIM_TIMEOUT:-2700}   # 45 min > the 40 min worst-case wedge
SLEEP_BETWEEN=${TPU_CLAIM_SLEEP:-900}      # 15 min of total silence between attempts
ATTEMPTS=${TPU_CLAIM_ATTEMPTS:-8}
for attempt in $(seq 1 "$ATTEMPTS"); do
  echo "=== patient claim attempt $attempt/$ATTEMPTS $(date +%T) (timeout ${CLAIM_TIMEOUT}s) ==="
  timeout "$CLAIM_TIMEOUT" python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); d=jax.devices(); print('devices', d, f'{time.time()-t0:.1f}s', flush=True)
x=jnp.ones((256,256)); y=(x@x).block_until_ready()
print('CLAIM OK', f'{time.time()-t0:.1f}s total', flush=True)
" && { echo "tunnel alive $(date +%T); running $QUEUE"; bash "$QUEUE"; exit $?; }
  echo "attempt $attempt failed rc=$? $(date +%T); sleeping ${SLEEP_BETWEEN}s"
  sleep "$SLEEP_BETWEEN"
done
echo "GAVE UP after $ATTEMPTS patient attempts $(date +%T)"
exit 1
