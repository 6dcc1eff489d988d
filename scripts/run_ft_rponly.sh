#!/bin/bash
# Regenerate the fixed-L base checkpoint, then run the rp-only fixed-L
# fine-tune arm — the fourth cell of the restart x range-penalty 2x2
# (RECIPE_FT_CTL / RECIPE_VARL_FT / RECIPE_VARL_FT_RP are the other three).
#
# The original fixL base (RECIPE_VARL_BASE.json: 300 epochs, seed 0) peaked
# at epoch 53 and was never beaten afterwards, so a same-seed 100-epoch
# rerun reproduces the identical best/ snapshot at a third of the cost
# (selection keeps the best epoch; epochs 1-100 are the same trajectory).
# The regen leg's report goes to /tmp for a determinism cross-check
# (loop_best_score must read -17.5211, best_epoch 53).
set -u
cd /root/repo

COMMON=(--root /tmp/hrn_varl_data --scenes-per-channel 580 --views 16
        --lr-size 48 --detail 0.5 --hr-shift 0.0 --batch 32 --patch 32
        --lr-decay 0.97 --seed 0 --val-proportion 0.1 --epochs 100
        --checkpoint-every 10)

if [ ! -f /tmp/hrn_varl_data/ckpt/fixL/best/hrnet.msgpack ] && \
   [ ! -d /tmp/hrn_varl_data/ckpt/fixL/best ]; then
  scripts/supervise_tpu.sh /tmp/rponly_base.log 720 3 -- \
    python examples/quality_experiment.py "${COMMON[@]}" \
      --lr 7e-4 --run-name fixL --out /tmp/RECIPE_FIXL_REGEN.json || exit 1
fi

scripts/supervise_tpu.sh /tmp/rponly_ft.log 720 3 -- \
  python examples/quality_experiment.py "${COMMON[@]}" \
    --lr 2e-4 --init-from /tmp/hrn_varl_data/ckpt/fixL \
    --range-penalty 10 --variable-views-p 0.0 \
    --run-name ft_rponly --out /root/repo/RECIPE_FT_RPONLY.json
