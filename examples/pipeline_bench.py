"""Host input-pipeline throughput: live PNG vs packed vs epoch cache.

The training chip consumes scenes at hundreds of scenes/s (BASELINE.md);
this measures what one host core can FEED, across the three input paths:

  png    — live loader over per-view PNG decodes (reference-style)
  packed — live loader over the decode-free pack cache (data/pack.py)
  cache  — EpochCache mmap replay of pre-collated batches

    python examples/pipeline_bench.py [--scenes 64] [--views 16] \
        [--lr-size 128] [--out PIPELINE_BENCH.json]

Pure host benchmark: no TPU, no jax.
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(loader, epochs: int):
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch.lrs.shape[0]
            # touch the data the way device_put would (forces mmap reads)
            float(batch.lrs[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    return n / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hrn_pipe_bench")
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--lr-size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--out", default="PIPELINE_BENCH.json")
    args = ap.parse_args()

    from highresnet_tpu.data.pipeline import BatchLoader, EpochCache
    from highresnet_tpu.data.probav import discover_scenes
    from highresnet_tpu.data.synth import make_synthetic_dataset

    from highresnet_tpu.data.synth import synthetic_dataset_complete
    if not synthetic_dataset_complete(args.root):
        from highresnet_tpu.data.synth import clear_synthetic_dataset

        clear_synthetic_dataset(args.root)
        make_synthetic_dataset(
            args.root,
            n_scenes_per_channel=args.scenes // 2,
            n_views=args.views,
            lr_size=args.lr_size,
            seed=0,
            splits=("train",),
        )
    scenes = discover_scenes(os.path.join(args.root, "train"))

    def mk_loader():
        return BatchLoader(
            scenes, batch_size=args.batch, min_l=args.views, top_k=args.views,
            beta=50.0, create_patches=True, patch_size=args.patch,
            seed=0, num_workers=args.workers,
        )

    results = {}

    png_rate, png_s = run(mk_loader(), args.epochs)
    results["png_scenes_per_sec"] = round(png_rate, 1)

    from highresnet_tpu.cli.pack_dataset import main as pack_main

    t0 = time.perf_counter()
    pack_main(["--prefix", args.root])
    results["pack_build_seconds"] = round(time.perf_counter() - t0, 1)
    packed_rate, _ = run(mk_loader(), args.epochs)
    results["packed_scenes_per_sec"] = round(packed_rate, 1)

    cache_dir = os.path.join(args.root, ".bench_epoch_cache")
    shutil.rmtree(cache_dir, ignore_errors=True)
    cache = EpochCache(mk_loader(), cache_dir, n_variants=1)
    t0 = time.perf_counter()
    for _ in cache:  # build epoch (costs one live epoch)
        pass
    results["cache_build_seconds"] = round(time.perf_counter() - t0, 1)
    cache_rate, _ = run(cache, args.epochs)
    results["cache_scenes_per_sec"] = round(cache_rate, 1)

    results["protocol"] = {
        "scenes": len(scenes), "views": args.views, "lr_size": args.lr_size,
        "batch": args.batch, "patch": args.patch, "epochs_timed": args.epochs,
        "workers": args.workers, "host_cores": os.cpu_count(),
    }
    results["speedup_cache_vs_packed"] = round(cache_rate / packed_rate, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
