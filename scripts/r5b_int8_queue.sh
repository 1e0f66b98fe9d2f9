#!/bin/bash
# Round-5b serial TPU queue: measure the new W8A8 int8 serving mode
# (single-client axon tunnel rules per docs/TPU_NOTES.md: one sequential
# chain, generous timeouts, no kills mid-compile).
#
#   step 1: giant classify b32/b64 — int8 vs dequant-f16 (the mode's target:
#           SwiGLU MLP GEMMs are unfused, probe_int8 says +33% there)
#   step 2: ViT-B b64 — int8 vs dequant-f16 (slab routing: expect ~parity,
#           pins the "never slower" claim)
#   step 3: ViT-B b64 int8 with DINOV2_TPU_QUANT_SLAB=off (true unfused int8
#           A/B against the slab-dequant default)
#   step 4: giant int8 b1 (latency: per-row int8 = 1 B/weight HBM reads)
#   step 5: ViT-B fp16 b96/b128 ladder (is b64 the throughput plateau?)
#   step 6: bench.py headline sanity on the final tree
#
# Usage: nohup bash scripts/r5b_int8_queue.sh > /tmp/r5b_queue.log 2>&1 &
set -u
cd /root/repo
L=/tmp/r5b
mkdir -p "$L"

echo "=== step 0: tunnel health $(date +%T) ==="
timeout 1800 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); d=jax.devices(); print('devices', d, f'{time.time()-t0:.1f}s', flush=True)
x=jnp.ones((256,256)); y=(x@x).block_until_ready()
print('matmul ok', f'{time.time()-t0:.1f}s total', flush=True)
" || { echo "TUNNEL DEAD rc=$?"; exit 1; }

echo "=== step 1: giant int8 vs dequant, b32/b64 $(date +%T) ==="
timeout 5400 python -m dinov2_tpu.cli.benchmark --size giant --batch-sizes 32,64 \
  --iters 20 --quant-mode int8 --json > "$L/giant_int8.json" 2>"$L/giant_int8.err"
echo "giant int8 rc=$?"; tail -2 "$L/giant_int8.err"
timeout 5400 python -m dinov2_tpu.cli.benchmark --size giant --batch-sizes 32,64 \
  --iters 20 --json > "$L/giant_f16.json" 2>"$L/giant_f16.err"
echo "giant f16 rc=$?"

echo "=== step 2: ViT-B int8 vs dequant, b64 $(date +%T) ==="
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 \
  --iters 20 --quant-mode int8 --json > "$L/base_int8.json" 2>"$L/base_int8.err"
echo "base int8 rc=$?"
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 \
  --iters 20 --json > "$L/base_f16.json" 2>"$L/base_f16.err"
echo "base f16 rc=$?"

echo "=== step 3: ViT-B int8 UNFUSED (QUANT_SLAB=off) b64 $(date +%T) ==="
DINOV2_TPU_QUANT_SLAB=off timeout 3600 python -m dinov2_tpu.cli.benchmark \
  --size base --batch-sizes 64 --iters 20 --quant-mode int8 --json \
  > "$L/base_int8_unfused.json" 2>"$L/base_int8_unfused.err"
echo "base int8 unfused rc=$?"

echo "=== step 4: giant int8 b1 latency $(date +%T) ==="
timeout 3600 python -m dinov2_tpu.cli.benchmark --size giant --batch-sizes 1 \
  --iters 20 --quant-mode int8 --json > "$L/giant_int8_b1.json" 2>"$L/giant_int8_b1.err"
echo "giant int8 b1 rc=$?"

echo "=== step 5: ViT-B fp16 b96/b128 ladder $(date +%T) ==="
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 96,128 \
  --iters 20 --json > "$L/base_b128.json" 2>"$L/base_b128.err"
echo "b128 rc=$?"

echo "=== step 6: bench.py headline sanity $(date +%T) ==="
DINOV2_TPU_CLAIM_SCHEDULE=300,600 DINOV2_TPU_CLAIM_SLEEP_S=60 timeout 2400 python bench.py
echo "bench rc=$?"

echo "=== queue done $(date +%T) ==="
