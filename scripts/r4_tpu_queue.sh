#!/bin/bash
# Serial TPU work queue for the round-4 tail: the axon tunnel is single-client
# serial-RPC, so everything runs in ONE process chain. Each step is bounded.
#
# pack2 compile probes are deliberately ABSENT: the composed pack2 kernel's
# Mosaic compile is pathological and its orphaned remote compile is what
# wedged the terminal for hours (docs/TPU_NOTES.md round 4, pack-2 section).
# Do NOT re-add a pack2 build here without lane-aligning the score tile first.
#
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

echo "=== step 1: bench.py sanity (flagship) $(date +%T) ==="
# step 0 just verified the claim, so bench.py's own claim probe only needs a
# short window; the FULL default schedule (300+120+1500 s) exceeds this outer
# timeout and would get the long sit-through killed mid-init (a killed client
# re-wedges the tunnel, docs/TPU_NOTES.md)
DINOV2_TPU_CLAIM_SCHEDULE=300,600 DINOV2_TPU_CLAIM_SLEEP_S=60 timeout 2400 python bench.py
echo "bench rc=$?"

echo "=== step 2: tpu_suite refresh $(date +%T) ==="
timeout 3600 python scripts/tpu_suite.py > /tmp/r4_suite.json 2>/tmp/r4_suite.err
echo "suite rc=$? (json at /tmp/r4_suite.json)"
tail -2 /tmp/r4_suite.err

echo "=== step 3: CLI benchmark quant sweep (BENCH_TABLES refresh) $(date +%T) ==="
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 --iters 20 \
  --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode dequant --json > /tmp/r4_tables_dequant.json 2>/tmp/r4_tables_dequant.err
echo "dequant sweep rc=$?"
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 --iters 20 \
  --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode fused --json > /tmp/r4_tables_fused.json 2>/tmp/r4_tables_fused.err
echo "fused sweep rc=$?"

echo "=== step 4: ViT-S MFU receipt (post self-review-fix state) $(date +%T) ==="
DINOV2_PROFILE_SIZE=small timeout 2400 python scripts/profile_mfu.py slab
echo "vits rc=$?"

echo "=== step 4b: PV-f32 A/B (ViT-S slab; astype pass vs f32 MXU passes) $(date +%T) ==="
DINOV2_PROFILE_SIZE=small DINOV2_TPU_PV_F32=1 timeout 2400 python scripts/profile_mfu.py slab
echo "pvf32-small rc=$?"
DINOV2_TPU_PV_F32=1 timeout 2400 python scripts/profile_mfu.py slab
echo "pvf32-base rc=$?"

echo "=== step 5: training-step benchmark (new receipt) $(date +%T) ==="
timeout 2400 python scripts/bench_train.py small 64
echo "train-small rc=$?"
timeout 2400 python scripts/bench_train.py base 64
echo "train-base rc=$?"

echo "=== step 6: reference-mirror b1 latency sweep (BASELINE.md row-for-row) $(date +%T) ==="
for size in small base large giant; do
  timeout 3600 python -m dinov2_tpu.cli.benchmark --size "$size" --batch-sizes 1,64 --iters 20 \
    --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode dequant --json \
    > /tmp/r4_mirror_${size}_dequant.json 2>/tmp/r4_mirror_${size}_dequant.err
  echo "mirror $size dequant rc=$?"
  timeout 3600 python -m dinov2_tpu.cli.benchmark --size "$size" --batch-sizes 1 --iters 20 \
    --quant q4_0,q8_0 --quant-mode fused --json \
    > /tmp/r4_mirror_${size}_fused.json 2>/tmp/r4_mirror_${size}_fused.err
  echo "mirror $size fused rc=$?"
done

echo "=== step 7: final bench.py $(date +%T) ==="
DINOV2_TPU_CLAIM_SCHEDULE=300,600 DINOV2_TPU_CLAIM_SLEEP_S=60 timeout 2400 python bench.py
echo "bench rc=$?"
echo "=== queue done $(date +%T) ==="
