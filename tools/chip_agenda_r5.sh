#!/bin/bash
# Round-5 chip agenda: runs every VERDICT r4 measurement item in
# priority order, each step bounded and logged, continue-on-failure
# (the tunnel can degrade mid-run; whatever completed is kept).
# Usage: bash tools/chip_agenda_r5.sh [outdir]   (default /tmp/r5_chip)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r5_chip}
mkdir -p "$OUT"
log() { echo "[$(date +%T)] $*" | tee -a "$OUT/agenda.log"; }

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -f "$OUT/$name.done" ]; then log "skip $name (done)"; return 0; fi
  log "start $name"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then touch "$OUT/$name.done"; fi
  log "end $name rc=$rc"
  return $rc
}

# 0. probe: bail early if the tunnel is dead (driver reruns later)
step probe 120 python -u -c "
import time, jax, numpy as np, jax.numpy as jnp
print(jax.devices())
x=jnp.ones((64,256),jnp.int32); f=jax.jit(lambda v:v*2)
jax.block_until_ready(f(x))
ts=[]
for _ in range(6):
    t0=time.perf_counter(); np.asarray(f(x)); ts.append(time.perf_counter()-t0)
print('rtt_ms', sorted(ts)[3]*1000)
" || exit 1

# 1. real-pipeline eval profiles (VERDICT #1/#2 evidence)
step eval_greedy 2400 python tools/profile_eval_cli.py --repeats 3
step eval_joint 3600 python tools/profile_eval_cli.py --joint --repeats 3

# 2. sustained soaks (VERDICT #4 + checkpoints for #3)
step soak_l1 3600 python tools/train_sustained.py --family l1 \
    --steps 2500 --out /tmp/soak_l1
step soak_t5 5400 python tools/train_sustained.py --family t5 \
    --steps 2500 --out /tmp/soak_t5
step soak_l33 5400 python tools/train_sustained.py --family l33 \
    --steps 2500 --out /tmp/soak_l33

# 3. bf16-vs-f32 trained-weights parity (VERDICT #3) -> PARITY_FULLSIZE_r05
step parity_l1 3600 python tools/parity_trained.py --family l1 \
    --soak-dir /tmp/soak_l1
step parity_t5 5400 python tools/parity_trained.py --family t5 \
    --soak-dir /tmp/soak_t5
step parity_l33 5400 python tools/parity_trained.py --family l33 \
    --soak-dir /tmp/soak_l33

# 4. encoder fused-attention A/B (VERDICT #6): profile_train has the
# fused_attn variant built in (one run covers on/off)
step profile_train 2400 python tools/profile_train.py --json

# 5. in-pipeline LSTM A/B on the T5 step (VERDICT #7)
step lstm_scan 1800 env EMOASR_LSTM_PALLAS=0 python tools/profile_t5.py
step lstm_pallas 1800 env EMOASR_LSTM_PALLAS=1 python tools/profile_t5.py

# 6. regressed-row bisects (VERDICT #5): per-row top-k strategy A/B
for mode in auto direct chunked; do
  step "bisect_ctc_beam8_$mode" 1800 env EMOASR_TOPK=$mode \
      BENCH_ONLY=ctc_beam8_rtf_L1 python bench.py
done
step bisect_ctc_greedy 1200 env BENCH_ONLY=ctc_greedy_batched_rtf_L1 \
    python bench.py
step bisect_rescore 1800 env BENCH_ONLY=rescore_rtf_bert python bench.py
step bisect_correct 1800 env BENCH_ONLY=correct_rtf_bert python bench.py

# 7. flagship per-component profile (VERDICT #8 next lever)
step stub_full 3600 python tools/stub_full.py --batch 64 --dtype bfloat16

# 8. full scoreboard last (longest; needs the healthiest tunnel)
step bench_full 5400 python bench.py

log "agenda complete"
