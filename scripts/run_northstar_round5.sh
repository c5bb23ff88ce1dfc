#!/bin/bash
# Round-5 north-star study driver (VERDICT r4 items 2, 3, 8).
#
# The round-4 warm start + view streams did not survive the round
# boundary (only the git-tracked result JSONs did), so round 5
# regenerates the full chain and re-runs BOTH sides of every pair
# against the new warm start:
#   - dataset + CRN view streams, seeds 0-7 (48 steps, batch 32)
#   - warm start: 1536 supervised shape-seeding steps + 1024 DINO steps
#     at the reference config shape (batch 128, device augmentation)
#   - initcheck artifact (experiments/northstar/initcheck.json)
#   - n=8 paired seeds, production engine (bf16 + Pallas + packed locals)
#     vs torch fp32 CPU — 48 uncoupled continuation steps, batch 32
#   - engine-ablation bisect on seeds 0-3: production vs bf16_xla
#     (kernels removed) vs fp32_xla (bf16 also removed), same torch runs
#   - CRN noise floor: production reruns differing ONLY in the
#     continuation RNG (dropout stream), paired against production
#   - dropout-0 deterministic continuations on seeds 0-3, BOTH sides:
#     with dropout off and CRN views, each side is deterministic given
#     the stream — the paired delta isolates framework numerics and
#     resolves the 0.5-pt bound without dropout-chaos variance
#
# torch legs run in the background (1-core CPU, ~20-35 min/seed);
# ours legs run serially against the TPU. Logs under
# experiments/northstar/logs/.
set -u
cd "$(dirname "$0")/.."
NS="python scripts/northstar_parity.py"
WARM_NPZ=experiments/northstar/ns_warm_step1024.npz
WARM_PTH=experiments/northstar/ns_warm_step1024.pth
LOGD=experiments/northstar/logs
mkdir -p "$LOGD"

stage="${1:-help}"

case "$stage" in
gen)
  $NS gen 2>&1 | tee "$LOGD/gen.log"
  $NS genviews --steps 48 --batch 32 --seeds 0 1 2 3 4 5 6 7 \
    2>&1 | tee "$LOGD/genviews.log"
  ;;
pretrain)
  $NS pretrain --steps 3072 --batch 128 --chunk 64 --eval-every 256 \
    --save-at 1024 --stop-after-save --seed-backbone-steps 1536 \
    --seed-lr 3e-4 --peak-lr 2.5e-4 --mom0 0.99 \
    2>&1 | tee "$LOGD/pretrain_r5.log"
  ;;
initcheck)
  $NS initcheck --init-npz "$WARM_NPZ" --init-pth "$WARM_PTH" \
    2>&1 | tee "$LOGD/initcheck.log"
  ;;
torch)
  # the long pole: run in the background, seeds sequential
  nohup bash -c "
    $NS torch --seeds 0 1 2 3 4 5 6 7 --steps 48 --batch 32 \
      --init-from $WARM_PTH
    $NS torch --seeds 0 1 2 3 4 5 6 7 --steps 48 --batch 32 \
      --peak-lr 1e-4 --init-from $WARM_PTH --dropout0 --label torch-drop0
  " > "$LOGD/torch_marathon.log" 2>&1 &
  echo $! > /tmp/ns_torch.pid
  echo "torch marathon started (pid $(cat /tmp/ns_torch.pid))"
  ;;
ours)
  $NS ours --seeds 0 1 2 3 4 5 6 7 --steps 48 --batch 32 \
    --init-from "$WARM_NPZ" 2>&1 | tee "$LOGD/ours_prod.log"
  $NS ours --seeds 0 1 2 3 4 5 6 7 --steps 48 --batch 32 --peak-lr 1e-4 \
    --init-from "$WARM_NPZ" \
    --dropout0 --label ours-drop0 2>&1 | tee "$LOGD/ours_drop0.log"
  $NS ours --seeds 0 1 2 3 4 5 6 7 --steps 48 --batch 32 --peak-lr 1e-4 \
    --init-from "$WARM_NPZ" --engine fp32_xla \
    --dropout0 --label ours-drop0fp32 2>&1 | tee "$LOGD/ours_drop0fp32.log"
  $NS ours --seeds 0 1 2 3 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --engine fp32_xla --label ours-fp32 2>&1 | tee "$LOGD/ours_fp32.log"
  $NS ours --seeds 0 1 2 3 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --engine bf16_xla --label ours-bf16xla 2>&1 | tee "$LOGD/ours_bf16xla.log"
  $NS ours --seeds 0 1 2 3 --steps 48 --batch 32 --init-from "$WARM_NPZ" \
    --rng-offset 1000 --label ours-rng1 2>&1 | tee "$LOGD/ours_rng1.log"
  ;;
report)
  $NS report --round 5 --append PARITY_REPORT.md
  $NS report --ours-side ours-rng1 --vs-side ours          # noise floor
  $NS report --ours-side ours-fp32 --vs-side torch         # bisect
  $NS report --ours-side ours-bf16xla --vs-side torch
  $NS report --ours-side ours-drop0 --vs-side torch-drop0  # deterministic
  $NS report --ours-side ours-drop0fp32 --vs-side torch-drop0   # offset is fp32-invariant
  $NS report --ours-side ours-drop0 --vs-side ours-drop0fp32    # TPU stack outcome-neutral
  ;;
*)
  echo "usage: $0 {gen|pretrain|initcheck|torch|ours|report}"
  ;;
esac
