"""Evaluate a trained checkpoint — the `test_model.ipynb` capability.

Loads best weights from a run dir, scores train/val/test splits
(shift_cPSNR + ESA-ratio benchmark table), prints score statistics, and
optionally writes a Kelvin submission archive.

    python examples/test_model.py --config configs/config.json \
        --checkpoint models/weights/<run>/ [--submission submission/]
"""

import argparse


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", default="configs/config.json")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--submission", default=None)
    parser.add_argument("--top-k", type=int, default=-1)
    args = parser.parse_args()

    from highresnet_tpu.config import load_config
    from highresnet_tpu.eval.evaluator import Model, load_data

    config = load_config(args.config)
    train_ds, val_ds, test_ds, baseline = load_data(args.config, top_k=args.top_k)

    model = Model(config)
    model.load_checkpoint(args.checkpoint)
    results = model.evaluate(train_ds, val_ds, test_ds, baseline)
    print(results)
    if hasattr(results, "groupby"):
        print("\nscore stats by split (ESA/model, lower is better):")
        print(results.groupby("part")["score"].describe())

    if args.submission:
        archive = model.generate_submission_file(test_ds, out=args.submission)
        print(f"submission: {archive}")


if __name__ == "__main__":
    main()
