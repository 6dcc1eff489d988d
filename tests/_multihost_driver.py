"""Subprocess driver for the true multi-process training tests.

Invoked as:  python _multihost_driver.py <mode> <root> <out.json>
  mode 'single'   — single-controller run on 4 virtual CPU devices
  mode 'multi'    — one process of a 2-process run (2 local devices each);
                    HRN_COORDINATOR / HRN_NUM_PROCESSES / HRN_PROCESS_ID
                    are already in the environment

The config is fully deterministic (no view sampling: n_views=-1 loads all
views clearance-sorted; no patches; no shuffling), so the 2-process global
batch is a permutation of the single-controller batch and every epoch's
loss/val must agree to float tolerance.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode, root, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

CONFIG = {
    "network": {
        "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 8},
        "recursive": {"alpha_residual": True, "in_channels": 8, "kernel_size": 3},
        "decoder": {
            "deconv": {"in_channels": 8, "kernel_size": 3, "stride": 3, "out_channels": 8},
            "final": {"in_channels": 8, "kernel_size": 1, "out_channels": 1},
        },
    },
    "training": {
        "batch_size": 4,
        "min_L": 4,
        "n_views": -1,  # deterministic: all views, clearance-sorted
        "crop": 1,
        "lr": 1e-3,
        "lr_step": 2,
        "lr_decay": 0.97,
        "beta": 50.0,
        "create_patches": False,
        "patch_size": 24,  # == synthetic lr_size (full-frame training)
        "register_size": 32,
        "val_proportion": 0.34,
        "lambda": 1e-6,
        # resume leg: phase B relaunches with HRN_TEST_EPOCHS=4 against the
        # same run_dir and must continue from the phase-A checkpoint
        "num_epochs": int(os.environ.get("HRN_TEST_EPOCHS", "2")),
        "n_workers": 1,
        "seed": 0,
        "shuffle": False,
        # > 1 so the SHARDED eval path runs across processes for real:
        # global_from_replicated feeds (loop.py) + the replicate_out
        # all-gather in the eval step — eval_batch_size=1 would fall back
        # to the single-device eval the reference uses
        "eval_batch_size": 2,
        "checkpoint_every": 0,
    },
    "paths": {"prefix": root, "checkpoint_dir": os.path.join(root, f"ckpt_{mode}"),
              "tb_log_file_dir": ""},
}


class _EpochTap:
    """Capture the loop's per-epoch print lines."""

    def __init__(self):
        self.lines = []

    def write(self, s):
        if s.startswith("epoch "):
            self.lines.append(s.strip())
        sys.__stdout__.write(s)

    def flush(self):
        sys.__stdout__.flush()


import highresnet_tpu.train.loop as loop_mod  # noqa: E402
from highresnet_tpu.train.loop import train_and_get_best_model  # noqa: E402

if mode == "single":
    # Present the train scenes in the 2-host GLOBAL batch order
    # ([h0 shard of batch k] + [h1 shard of batch k]) so the
    # single-controller batches are element-for-element identical to the
    # distributed ones — a permuted batch is mathematically equivalent but
    # reduction-order bit noise gets amplified by Adam's sign-like updates.
    from highresnet_tpu.data.pipeline import shard_for_hosts

    _orig_split = loop_mod.train_val_split

    def _split_interleaved(dirs, prop, seed=1):
        tr, va = _orig_split(dirs, prop, seed=seed)
        h0, h1 = shard_for_hosts(tr, 0, 2), shard_for_hosts(tr, 1, 2)
        lb = CONFIG["training"]["batch_size"] // 2
        mixed = []
        for k in range(len(h0) // lb):
            mixed += h0[k * lb : (k + 1) * lb] + h1[k * lb : (k + 1) * lb]
        return mixed, va

    loop_mod.train_val_split = _split_interleaved

tap = _EpochTap()
sys.stdout = tap
run_dir = os.environ.get("HRN_TEST_RUN_DIR") or os.path.join(root, f"run_{mode}")
out = train_and_get_best_model(CONFIG, run_dir=run_dir)
sys.stdout = sys.__stdout__

losses = []
vals = []
for line in tap.lines:
    parts = dict(p.split("=") for p in line.split()[2:] if "=" in p)
    losses.append(float(parts["loss"]))
    vals.append(float(parts["val"]))

result = {
    "mode": mode,
    "process_index": jax.process_index(),
    "process_count": jax.process_count(),
    "device_count": jax.device_count(),
    "best_score": float(out["best_score"]),
    "losses": losses,
    "vals": vals,
    "run_dir": out["run_dir"],
}
with open(out_path, "w") as f:
    json.dump(result, f)
print("DRIVER_OK", json.dumps(result))
