#!/bin/bash
# Serial TPU work queue for the round-4 tail: the axon tunnel is single-client
# serial-RPC, so everything runs in ONE process chain. Each step is bounded.
# Usage: nohup bash scripts/r4_tpu_queue.sh > /tmp/r4_queue.log 2>&1 &
set -u
cd /root/repo
echo "=== step 0: tunnel health $(date +%T) ==="
timeout 1800 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); d=jax.devices(); print('devices', d, f'{time.time()-t0:.1f}s', flush=True)
x=jnp.ones((256,256)); y=(x@x).block_until_ready()
print('matmul ok', f'{time.time()-t0:.1f}s total', flush=True)
" || { echo "TUNNEL DEAD rc=$?"; exit 1; }

echo "=== step 1a: pack2 micro compile probe (one pair) $(date +%T) ==="
timeout 1800 python scripts/probe_pack2_compile.py --micro
MRC=$?
echo "micro rc=$MRC"
echo "=== step 1b: pack2 slab compile probe nb=1 $(date +%T) ==="
timeout 2400 python scripts/probe_pack2_compile.py 1
P2RC=$?
echo "probe rc=$P2RC"
[ "$MRC" -ne 0 ] && P2RC=1

if [ "$P2RC" -eq 0 ]; then
  echo "=== step 2: pack2 full-model A/B (ViT-S b64) $(date +%T) ==="
  timeout 2400 python scripts/bench_opts.py --size small --batch 64 baseline
  echo "--- pack2 on ---"
  DINOV2_TPU_ATT_PACK2=1 timeout 3000 python scripts/bench_opts.py --size small --batch 64 baseline
  echo "pack2 A/B rc=$?"
else
  echo "=== step 2 SKIPPED: pack2 compile pathological/timeout ==="
fi

echo "=== step 3: tpu_suite refresh $(date +%T) ==="
timeout 3600 python scripts/tpu_suite.py > /tmp/r4_suite.json 2>/tmp/r4_suite.err
echo "suite rc=$? (json at /tmp/r4_suite.json)"
tail -2 /tmp/r4_suite.err

echo "=== step 3b: CLI benchmark quant sweep (BENCH_TABLES refresh) $(date +%T) ==="
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 --iters 20 \
  --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode dequant --json > /tmp/r4_tables_dequant.json 2>/tmp/r4_tables_dequant.err
echo "dequant sweep rc=$?"
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 --iters 20 \
  --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode fused --json > /tmp/r4_tables_fused.json 2>/tmp/r4_tables_fused.err
echo "fused sweep rc=$?"

echo "=== step 4: final bench.py $(date +%T) ==="
timeout 1800 python bench.py
echo "bench rc=$?"
echo "=== queue done $(date +%T) ==="
