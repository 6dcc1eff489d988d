"""Precompute per-view clearance scores (clearance.npy) for all scenes.

Usage (mirrors the reference CLI, src/save_clearance.py:30-53):
    python -m highresnet_tpu.cli.save_clearance --prefix data/
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--prefix", default="data/", help="root dir of the dataset")
    args = parser.parse_args(argv)
    assert os.path.isdir(args.prefix), args.prefix

    from highresnet_tpu.data.probav import discover_scenes, save_clearance_scores

    for split in ("train", "test"):
        split_dir = os.path.join(args.prefix, split)
        if os.path.isdir(split_dir):
            scenes = discover_scenes(split_dir)
            save_clearance_scores(scenes)
            print(f"{split}: wrote clearance.npy for {len(scenes)} scenes")


if __name__ == "__main__":
    main()
