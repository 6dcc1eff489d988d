"""Quality evidence: trained MFSR vs naive baselines on a validation split.

For each val scene, reports shift_cPSNR of:
  - the trained HRNet SR (all views),
  - the trained HRNet with a single view (MFSR benefit ablation),
  - bicubic 3x upsampling of the clearest LR view (no-learning baseline).

    python examples/quality_report.py --data <root> --checkpoint <run_dir> \
        [--config configs/config.json]
"""

import argparse

import numpy as np


def bicubic_x3(img: np.ndarray) -> np.ndarray:
    import jax.image
    import jax.numpy as jnp

    h, w = img.shape
    return np.asarray(
        jax.image.resize(jnp.asarray(img), (3 * h, 3 * w), method="cubic")
    )


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", required=True)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--config", default=None)
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--val-proportion", type=float, default=0.25)
    args = parser.parse_args()

    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, discover_scenes, read_imageset, train_val_split
    from highresnet_tpu.eval.evaluator import load_model
    from highresnet_tpu.ops.metrics import shift_cpsnr

    config = load_config(args.config)
    hrnet, params = load_model(config, args.checkpoint)

    scenes = discover_scenes(f"{args.data}/train")
    _, val = train_val_split(scenes, args.val_proportion, seed=1)

    import jax

    fwd = jax.jit(lambda p, lrs, alphas: hrnet.apply({"params": p}, lrs, alphas))

    rows = []
    for d in val:
        s = read_imageset(d, top_k=args.views, beta=50.0)
        batch = collate([s], args.views)
        sr = np.asarray(fwd(params, jnp.asarray(batch.lrs), jnp.asarray(batch.alphas)))[0]

        one = collate([s], 1)
        sr1 = np.asarray(fwd(params, jnp.asarray(one.lrs), jnp.asarray(one.alphas)))[0]

        cubic = bicubic_x3(s.lr[0])

        score = lambda img: float(
            shift_cpsnr(jnp.clip(jnp.asarray(img), 0, 1), jnp.asarray(s.hr), jnp.asarray(s.hr_map))
        )
        rows.append((s.name, score(sr), score(sr1), score(cubic)))

    print(f"{'scene':<12} {'MFSR':>8} {'1-view':>8} {'bicubic':>8}")
    for name, a, b, c in rows:
        print(f"{name:<12} {a:8.2f} {b:8.2f} {c:8.2f}")
    arr = np.array([[a, b, c] for _, a, b, c in rows])
    print(f"{'mean':<12} {arr[:,0].mean():8.2f} {arr[:,1].mean():8.2f} {arr[:,2].mean():8.2f}")


if __name__ == "__main__":
    main()
