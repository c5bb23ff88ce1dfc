#!/bin/bash
# Round-5 north-star study driver (VERDICT r4 items 2, 3, 8).
#
# Extends the recorded round-4 study (4 paired seeds x 48 steps from the
# shared ns_warm_step1024 start) to:
#   - n=8 paired seeds (adds seeds 4-7, same protocol: 48 uncoupled
#     continuation steps, batch 32, CRN view streams)
#   - an engine-ablation bisect on all seeds: production (bf16 + Pallas +
#     packed locals) vs bf16_xla (kernels removed) vs fp32_xla (bf16 also
#     removed) — one variable at a time against the SAME torch runs
#   - a framework-internal noise floor: production reruns differing ONLY
#     in the continuation RNG (dropout stream), paired against the
#     original production runs
#   - the initcheck artifact (experiments/northstar/initcheck.json)
#
# Stage T (torch, CPU, ~30 min/seed) runs in the background; stage O
# (ours, TPU) runs serially in the foreground. Logs under
# experiments/northstar/logs/.
set -u
cd "$(dirname "$0")/.."
NS="python scripts/northstar_parity.py"
WARM_NPZ=experiments/northstar/ns_warm_step1024.npz
WARM_PTH=experiments/northstar/ns_warm_step1024.pth
LOGD=experiments/northstar/logs
mkdir -p "$LOGD"

stage="${1:-all}"

if [ "$stage" = "views" ] || [ "$stage" = "all" ]; then
  $NS genviews --steps 48 --batch 32 --seeds 4 5 6 7 \
    2>&1 | tee "$LOGD/genviews.log"
fi

if [ "$stage" = "torch" ] || [ "$stage" = "all" ]; then
  nohup $NS torch --seeds 4 5 6 7 --steps 48 --batch 32 \
    --init-from "$WARM_PTH" > "$LOGD/torch_seed4567.log" 2>&1 &
  echo $! > /tmp/ns_torch.pid
  echo "torch marathon started (pid $(cat /tmp/ns_torch.pid))"
fi

if [ "$stage" = "initcheck" ] || [ "$stage" = "all" ]; then
  $NS initcheck --init-npz "$WARM_NPZ" --init-pth "$WARM_PTH" \
    2>&1 | tee "$LOGD/initcheck.log"
fi

if [ "$stage" = "ours" ] || [ "$stage" = "all" ]; then
  # production, new seeds (one process per leg: compile once, 4 seeds)
  $NS ours --seeds 4 5 6 7 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    2>&1 | tee "$LOGD/ours_seed4567.log"
  # ablation bisect + noise floor, original seeds
  $NS ours --seeds 0 1 2 3 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --engine fp32_xla --label ours-fp32 \
    2>&1 | tee "$LOGD/ours_fp32_seed0123.log"
  $NS ours --seeds 0 1 2 3 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --engine bf16_xla --label ours-bf16xla \
    2>&1 | tee "$LOGD/ours_bf16xla_seed0123.log"
  $NS ours --seeds 0 1 2 3 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --rng-offset 1000 --label ours-rng1 \
    2>&1 | tee "$LOGD/ours_rng1_seed0123.log"
fi

if [ "$stage" = "ours-ext" ]; then
  # optional second wave once the first lands: ablations on seeds 4-7
  $NS ours --seeds 4 5 6 7 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --engine fp32_xla --label ours-fp32 \
    2>&1 | tee "$LOGD/ours_fp32_seed4567.log"
  $NS ours --seeds 4 5 6 7 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --rng-offset 1000 --label ours-rng1 \
    2>&1 | tee "$LOGD/ours_rng1_seed4567.log"
fi

echo "stage '$stage' dispatched"
