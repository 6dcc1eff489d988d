#!/bin/bash
# Round-5 measurement queue (run AFTER scripts/run_ft_rponly.sh):
#   1. views-ablation curve of the rp-only fixed-L fine-tune (its low-L
#      brittleness is the open question from VERDICT round-4 weak #1)
#   2. deterministic rerun of the restart-only control, now recording the
#      full per-epoch val trajectory (kills the epoch-18 selection
#      confound, weak #2)
#   3. the missing composition cell: variable-L fine-tune FROM the rp-only
#      checkpoint (does +2.7 dB at L=16 compose with low-L monotonicity?)
#   4. views-ablation curve of that composition cell
#   5. range-penalty sweep rp in {30, 100} at fixed L + their ablation
#      curves (overflow-vs-quality frontier for warn_out_of_range, #3)
# One TPU process at a time; every leg is relaunch-safe under the
# supervisor (stable run dirs + checkpoint_every).
set -u
cd /root/repo

COMMON=(--root /tmp/hrn_varl_data --scenes-per-channel 580 --views 16
        --lr-size 48 --detail 0.5 --hr-shift 0.0 --batch 32 --patch 32
        --lr-decay 0.97 --seed 0 --val-proportion 0.1 --epochs 100
        --checkpoint-every 10)
CKPT=/tmp/hrn_varl_data/ckpt
SUP="scripts/supervise_tpu.sh"

run_ablation () { # run_dir out
  $SUP "/tmp/r5_va_$(basename "$1").log" 720 3 -- \
    python examples/views_ablation.py --root /tmp/hrn_varl_data \
      --checkpoint "$1" --max-scenes 30 --out "$2"
}

# 1. rp-only low-L curve
[ -f VIEWS_ABLATION_FT_RPONLY.json ] || \
  run_ablation "$CKPT/ft_rponly" VIEWS_ABLATION_FT_RPONLY.json || exit 1

# 2. restart-only control, same seed/protocol, now with val_history
[ -d "$CKPT/ft_ctl/best" ] && [ -f "$CKPT/ft_ctl/best_score.json" ] || true
$SUP /tmp/r5_ctl.log 720 3 -- \
  python examples/quality_experiment.py "${COMMON[@]}" \
    --lr 2e-4 --init-from "$CKPT/fixL" \
    --run-name ft_ctl --out /root/repo/RECIPE_FT_CTL.json || exit 1

# 3. composition cell: variable-L + rp fine-tune FROM the rp-only best
$SUP /tmp/r5_comp.log 720 3 -- \
  python examples/quality_experiment.py "${COMMON[@]}" \
    --lr 2e-4 --init-from "$CKPT/ft_rponly" \
    --range-penalty 10 --variable-views-p 0.5 \
    --run-name varL_ft_from_rp \
    --out /root/repo/RECIPE_VARL_FT_FROM_RP.json || exit 1

# 4. its low-L curve
run_ablation "$CKPT/varL_ft_from_rp" VIEWS_ABLATION_VARL_FT_FROM_RP.json || exit 1

# 5. range-penalty sweep (fixed-L rp-only arms at 30 and 100)
for RP in 30 100; do
  $SUP "/tmp/r5_rp$RP.log" 720 3 -- \
    python examples/quality_experiment.py "${COMMON[@]}" \
      --lr 2e-4 --init-from "$CKPT/fixL" \
      --range-penalty "$RP" --variable-views-p 0.0 \
      --run-name "ft_rp$RP" --out "/root/repo/RECIPE_FT_RP$RP.json" || exit 1
  run_ablation "$CKPT/ft_rp$RP" "VIEWS_ABLATION_FT_RP$RP.json" || exit 1
done

echo "=== round-5 queue complete ==="
