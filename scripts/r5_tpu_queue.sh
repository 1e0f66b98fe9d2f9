#!/bin/bash
# Round-5 serial TPU work queue (single-client axon tunnel: everything in ONE
# sequential process chain; never two TPU clients at once).
#
# Ordered by judge value (VERDICT r4 "next round" items):
#   item 2: regenerate every judge-facing table with the round-4 core, all
#           four sizes, with/without registers, classify + 518px feature mode
#   item 5: _batch_chunk sweep beyond the tuned shape
#   item 4: long-T flash bench + on-chip parity
#   item 6: realtime double-buffering A/B
#   item 3: pack2 probes DEAD LAST (a pathological Mosaic compile can wedge
#           the terminal; everything judge-facing must already be on disk)
#
# Per docs/TPU_NOTES.md: timeouts are generous (a killed TPU client wedges the
# next init 15-40 min); the pack2 probes get NO outer timeout — the server's
# ~25-min claim kick self-bounds them — only a log-only watchdog (ADVICE r4).
#
# Usage: nohup bash scripts/r5_tpu_queue.sh > /tmp/r5_queue.log 2>&1 &
set -u
cd /root/repo
L=/tmp/r5
mkdir -p "$L"

echo "=== step 0: tunnel health $(date +%T) ==="
timeout 1800 python -c "
import jax, jax.numpy as jnp, time
t0=time.time(); d=jax.devices(); print('devices', d, f'{time.time()-t0:.1f}s', flush=True)
x=jnp.ones((256,256)); y=(x@x).block_until_ready()
print('matmul ok', f'{time.time()-t0:.1f}s total', flush=True)
" || { echo "TUNNEL DEAD rc=$?"; exit 1; }

echo "=== step 1: bench.py sanity (flagship) $(date +%T) ==="
DINOV2_TPU_CLAIM_SCHEDULE=300,600 DINOV2_TPU_CLAIM_SLEEP_S=60 timeout 2400 python bench.py
echo "bench rc=$?"

echo "=== step 2: tpu_suite refresh (SUITE_RESULTS regen) $(date +%T) ==="
timeout 3600 python scripts/tpu_suite.py > "$L/suite.json" 2>"$L/suite.err"
echo "suite rc=$?"; tail -2 "$L/suite.err"

echo "=== step 3: BENCH_TABLES quant sweeps (base b64) $(date +%T) ==="
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 --iters 20 \
  --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode dequant --json > "$L/tables_dequant.json" 2>"$L/tables_dequant.err"
echo "dequant rc=$?"
timeout 3600 python -m dinov2_tpu.cli.benchmark --size base --batch-sizes 64 --iters 20 \
  --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode fused --json > "$L/tables_fused.json" 2>"$L/tables_fused.err"
echo "fused rc=$?"

echo "=== step 4: reference-mirror per-size sweeps $(date +%T) ==="
for size in small base large giant; do
  timeout 5400 python -m dinov2_tpu.cli.benchmark --size "$size" --batch-sizes 1,64 --iters 20 \
    --quant q4_0,q4_1,q5_0,q5_1,q8_0 --quant-mode dequant --json \
    > "$L/mirror_${size}_dequant.json" 2>"$L/mirror_${size}_dequant.err"
  echo "mirror $size dequant rc=$?"
  timeout 5400 python -m dinov2_tpu.cli.benchmark --size "$size" --batch-sizes 1 --iters 20 \
    --quant q4_0,q8_0 --quant-mode fused --json \
    > "$L/mirror_${size}_fused.json" 2>"$L/mirror_${size}_fused.err"
  echo "mirror $size fused rc=$?"
done

echo "=== step 4b: giant fp16 batch ladder b1-b64 $(date +%T) ==="
timeout 5400 python -m dinov2_tpu.cli.benchmark --size giant --batch-sizes 1,8,16,32,64 --iters 10 \
  --json > "$L/giant_ladder.json" 2>"$L/giant_ladder.err"
echo "giant ladder rc=$?"

echo "=== step 5: with-registers fp16 sweep (reg=4, all sizes) $(date +%T) ==="
for size in small base large giant; do
  timeout 5400 python -m dinov2_tpu.cli.benchmark --size "$size" --registers 4 \
    --batch-sizes 1,64 --iters 20 --json > "$L/reg_${size}.json" 2>"$L/reg_${size}.err"
  echo "reg $size rc=$?"
done

echo "=== step 6: 518px feature mode, all sizes $(date +%T) ==="
for size in small base large giant; do
  timeout 5400 python -m dinov2_tpu.cli.benchmark --size "$size" --features --px 518 \
    --batch-sizes 8 --iters 10 --json > "$L/feat518_${size}.json" 2>"$L/feat518_${size}.err"
  echo "feat518 $size rc=$?"
done

echo "=== step 7: _batch_chunk sweep (VERDICT item 5) $(date +%T) ==="
timeout 7200 python scripts/sweep_chunk.py > "$L/chunk.log" 2>&1
echo "chunk rc=$?"; grep RESULTS_JSON "$L/chunk.log" | tail -c 300

echo "=== step 8: long-T flash bench + on-chip parity (VERDICT item 4) $(date +%T) ==="
timeout 5400 python scripts/bench_longT.py > "$L/longt.log" 2>&1
echo "longt rc=$?"; grep RESULTS_JSON "$L/longt.log" | tail -c 300

echo "=== step 9: realtime double-buffer A/B (VERDICT item 6) $(date +%T) ==="
python - <<'EOF'
from dinov2_tpu.io.synthetic import write_synthetic_gguf
from dinov2_tpu.models.config import PRESETS, DinoConfig
cfg = DinoConfig(**{**PRESETS["base"].__dict__, "num_classes": 0})
write_synthetic_gguf("/tmp/r5/rt_base.gguf", cfg)
print("wrote /tmp/r5/rt_base.gguf")
EOF
# --no-pipeline is required for the sync leg: since ff54d45 the CLI default
# is the ADAPTIVE probe, so a bare invocation would not measure the sync loop
for mode in "--no-pipeline" "--pipeline"; do
  tag=$([ "$mode" = "--pipeline" ] && echo pipe || echo sync)
  timeout 2400 python -m dinov2_tpu.cli.realtime -m /tmp/r5/rt_base.gguf \
    --synthetic --no-display --frames 40 $mode > "$L/rt_${tag}.log" 2>&1
  echo "realtime $tag rc=$?"; tail -2 "$L/rt_${tag}.log"
done

echo "=== step 10: pack2 probes $(date +%T) ==="
# RAN 2026-08-19 02:55 (log /tmp/r5_queue.log): the micro probe FAILED with
# a hard Mosaic capability error (tpu.concatenate offset mismatch on the
# block-diagonal K assembly) -> verdict DELETE. probe_pack2_compile.py and
# the _pair_softmax_pv core were removed; receipt in docs/TPU_NOTES.md
# round 5 step 10. This step is now a no-op.
echo "pack2: resolved DELETE 2026-08-19 (see docs/TPU_NOTES.md round 5 step 10)"
echo "=== queue done $(date +%T) ==="
