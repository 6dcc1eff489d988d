"""Configuration: JSON files with the reference's schema, plus defaults.

Public-API compatibility: configs/config.json here mirrors the key layout
of the reference's config/config.json (paths / network / training) so
existing configs drop in unchanged (BASELINE.json requires API compat).
"""

from __future__ import annotations

import copy
import json
import warnings
from typing import Any, Dict

DEFAULT_CONFIG: Dict[str, Any] = {
    "paths": {
        "prefix": "data/",
        "checkpoint_dir": "models/weights",
        "tb_log_file_dir": "tb_logs/",
    },
    "network": {
        "encoder": {
            "in_channels": 2,
            "num_layers": 2,
            "kernel_size": 3,
            "channel_size": 64,
        },
        "recursive": {
            "alpha_residual": True,
            "in_channels": 64,
            "num_layers": 2,
            "kernel_size": 3,
        },
        "decoder": {
            "deconv": {"in_channels": 64, "kernel_size": 3, "stride": 3, "out_channels": 64},
            "final": {"in_channels": 64, "kernel_size": 1, "out_channels": 1},
        },
    },
    "training": {
        "num_epochs": 400,
        "batch_size": 8,
        "min_L": 2,
        "n_views": 8,
        "n_workers": 4,
        "crop": 3,
        "lr": 0.0007,
        "lr_step": 2,
        "lr_decay": 0.97,
        "load_lr_maps": False,
        "beta": 50.0,
        "create_patches": True,
        "patch_size": 64,
        "val_proportion": 0.10,
        "lambda": 0.000001,
        # TPU-native additions (absent keys default sensibly):
        "seed": 123,
        "compute_dtype": "float32",  # or "bfloat16"
        "data_parallel": True,
        "eval_batch_size": 1,
        "checkpoint_every": 0,  # extra periodic checkpointing (0 = best-only)
    },
}


def _merge(base: Dict[str, Any], override: Dict[str, Any], path: str = "") -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in override.items():
        where = f"{path}.{k}" if path else k
        if k not in out:
            out[k] = copy.deepcopy(v)
        elif isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v, where)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str | None = None, overrides: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Load a JSON config merged over DEFAULT_CONFIG.

    Unknown top-level sections warn (mirroring the registration toolkit's
    defaults-merge with unknown-key warnings, registration_helpers.py:21-43).
    """
    cfg = copy.deepcopy(DEFAULT_CONFIG)
    if path is not None:
        with open(path) as f:
            user = json.load(f)
        for k in user:
            if k not in DEFAULT_CONFIG:
                warnings.warn(f"Unknown config section: {k!r}")
        cfg = _merge(cfg, user)
    if overrides:
        cfg = _merge(cfg, overrides)
    return cfg
