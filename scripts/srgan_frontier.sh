#!/bin/bash
# SRGAN stage-2 fine-tune frontier (VERDICT r3 next #5): one cached 120k-step
# SRResNet pretrain, then several adversarial fine-tune configurations; each
# point records held-out PSNR gain vs bicubic + perceptual distances.
# The winner (>= +2.0 dB with the perceptual win kept) ships to weights/srgan
# and the frontier table lands in weights/README.md + srgan/meta.json.
#
# Usage: bash scripts/srgan_frontier.sh [PRETRAIN_STEPS]
set -u
cd "$(dirname "$0")/.."
PRE=${1:-120000}
CACHE=/tmp/sr_stage1_full
OUT=/tmp/sr_sweep

run() { # tag, extra args...
  tag=$1; shift
  echo "=== frontier point: $tag ==="
  timeout 14400 python scripts/train_serving_weights.py --family srgan \
    --batch 16 --size 128 --pretrain-steps "$PRE" --pretrain-ckpt "$CACHE" \
    --out "$OUT/$tag" "$@" 2>&1 | grep -v WARNING | tail -20
  echo "--- meta: $OUT/$tag/srgan/meta.json"
  cat "$OUT/$tag/srgan/meta.json" 2>/dev/null
  echo
}

# A: the shipped r3 recipe re-derived from this pretrain (baseline point)
run A_shipped   --steps 1000 --finetune-lr 2e-5
# B: A + EMA of G (averaged trajectory; better-PSNR endpoint ships)
run B_ema       --steps 1000 --finetune-lr 2e-5 --ema 0.995
# C: shorter + gentler + stronger pixel anchor
run C_gentle    --steps 400 --finetune-lr 1e-5 --pixel-anchor 2.0
echo "frontier sweep complete"
