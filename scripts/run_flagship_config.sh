#!/bin/bash
# Drive the shipped flagship configs end-to-end through the CLI surface
# (cli.train + cli.predict --tta 8) on the chip:
#
#   control          configs/flagship.json minus the recipe knobs
#                    (reference-default training on identical data)
#   flagship         configs/flagship.json        (+ predict --tta 8)
#   flagship_ft_rp   configs/flagship_ft_rp.json  (stage-2 fine-tune)
#   flagship_ft_varl configs/flagship_ft_varl.json (stage-3, the
#                    measured-best composition cell)
#
# so the CONFIGS, not an examples/ driver, reproduce the flagship-recipe
# result class (FLAGSHIP_RECIPE.json: +2.04 dB full+TTA vs plain) and the
# fine-tune arc (RECIPE_VARL_FT_FROM_RP.json). Emits
# FLAGSHIP_CONFIG_DRIVE.json.
#
# Reference behavior being matched: the reference ships its winning
# hparams as THE config (config/config.json:1-59) and trains/predicts
# through its CLIs (src/train.py:297-308, src/predict.py).
set -u
cd /root/repo
ROOT=/tmp/hrn_flagship_cfg
SUP="scripts/supervise_tpu.sh"

# Dataset (CPU-only) + materialized run configs (shipped configs with
# paths rewritten to the synthetic root; control = recipe knobs removed).
python - <<'PY' || exit 1
import json, os
from highresnet_tpu.data.synth import make_synthetic_dataset, synthetic_dataset_complete

ROOT = "/tmp/hrn_flagship_cfg"
if not synthetic_dataset_complete(ROOT):
    # FLAGSHIP_RECIPE.json protocol: 300 train scenes, 16 views, 48 px LR,
    # detail 0.5, per-scene Gaussian HR offsets sigma=1.25 px, seed 0.
    make_synthetic_dataset(
        ROOT, n_scenes_per_channel=150, n_views=16, lr_size=48, seed=0,
        detail=0.5, hr_shift_sigma=1.25,
    )

def materialize(src, dst, ckpt, init_from=None, strip_recipe=False):
    cfg = json.load(open(src))
    cfg["paths"]["prefix"] = ROOT
    cfg["paths"]["checkpoint_dir"] = os.path.join(ROOT, "ckpt")
    t = cfg["training"]
    if init_from is not None:
        t["init_params_from"] = init_from
    if strip_recipe:
        t["register"] = False
        t["augment_dihedral"] = False
        for k in ("shiftnet_warmup_steps", "shiftnet_warmup_sigma",
                  "register_warmup_epochs", "warp_int_range"):
            t.pop(k, None)
    with open(os.path.join(ROOT, dst), "w") as f:
        json.dump(cfg, f, indent=2)

os.makedirs(os.path.join(ROOT, "ckpt"), exist_ok=True)
materialize("configs/flagship.json", "control_run.json", "control", strip_recipe=True)
materialize("configs/flagship.json", "flagship_run.json", "flagship")
materialize("configs/flagship_ft_rp.json", "ft_rp_run.json", "ft_rp",
            init_from=os.path.join(ROOT, "ckpt", "flagship"))
materialize("configs/flagship_ft_varl.json", "ft_varl_run.json", "ft_varl",
            init_from=os.path.join(ROOT, "ckpt", "ft_rp"))
PY

# One TPU process at a time; every leg relaunch-safe under the supervisor.
train () { # config run-name
  $SUP "/tmp/r5_fs_$2.log" 720 3 -- \
    python -m highresnet_tpu.cli.train --config "$ROOT/$1" \
      --run-dir "$ROOT/ckpt/$2"
}
train control_run.json control   || exit 1
train flagship_run.json flagship || exit 1
train ft_rp_run.json ft_rp       || exit 1
train ft_varl_run.json ft_varl   || exit 1

# The shipped predict surface, on the SAME val scenes. The control and
# the RECOMMENDED endpoint (ft_varl) must be RuntimeWarning-silent
# (-W error fails them loudly). The stage-1-only checkpoint is predicted
# WITHOUT -W error: registered training on misaligned data with no range
# penalty overflows [0,1] by up to ~0.6 on some scenes (measured here —
# scene imgset0189, range [-0.353, 0.622]) and the warning is TRUTHFUL:
# it is the signal to run the fine-tune stages. The report audits it.
$SUP /tmp/r5_fs_pred_ctl.log 720 2 -- \
  python -W error::RuntimeWarning -m highresnet_tpu.cli.predict \
    --config "$ROOT/control_run.json" \
    --checkpoint "$ROOT/ckpt/control" --splits val || exit 1
$SUP /tmp/r5_fs_pred_full.log 720 2 -- \
  python -m highresnet_tpu.cli.predict \
    --config "$ROOT/flagship_run.json" \
    --checkpoint "$ROOT/ckpt/flagship" --tta 8 --splits val || exit 1
$SUP /tmp/r5_fs_pred_varl.log 720 2 -- \
  python -W error::RuntimeWarning -m highresnet_tpu.cli.predict \
    --config "$ROOT/ft_varl_run.json" \
    --checkpoint "$ROOT/ckpt/ft_varl" --tta 8 --splits val || exit 1

# Assemble FLAGSHIP_CONFIG_DRIVE.json: per-arm val scores via the package
# API (paired on identical scenes), plus a view-count sweep of the arc
# endpoints and a RuntimeWarning audit of the whole scoring pass.
$SUP /tmp/r5_fs_report.log 720 2 -- \
  python examples/flagship_config_report.py --root "$ROOT" \
    --out /root/repo/FLAGSHIP_CONFIG_DRIVE.json || exit 1

echo "=== flagship config drive complete ==="
