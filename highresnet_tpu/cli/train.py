"""Train HRNet + ShiftNet for multi-frame super-resolution.

Usage (mirrors the reference CLI, src/train.py:297-308):
    python -m highresnet_tpu.cli.train --config configs/config.json
Extra flags: --run-dir to resume a previous run, --max-steps for smoke runs.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/config.json", help="path of the config file")
    parser.add_argument("--run-dir", default=None, help="checkpoint dir to create/resume")
    parser.add_argument("--max-steps", type=int, default=None, help="stop after N optimizer steps")
    args = parser.parse_args(argv)
    assert os.path.isfile(args.config), args.config

    # persistent compile cache + JAX_PLATFORMS honoring (the axon
    # sitecustomize pins platforms over the env var): without this every
    # supervisor relaunch of a training run pays the full ~40 s/shape
    # TPU recompile bill again
    from highresnet_tpu.exp.harness import honor_platform_and_cache

    honor_platform_and_cache()

    from highresnet_tpu.config import load_config
    from highresnet_tpu.train.loop import train_and_get_best_model

    config = load_config(args.config)
    out = train_and_get_best_model(config, max_steps=args.max_steps, run_dir=args.run_dir)
    print(f"best score: {out['best_score']:.4f}  (weights in {out['run_dir']})")


if __name__ == "__main__":
    main()
