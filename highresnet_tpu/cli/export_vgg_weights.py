"""Convert torchvision VGG19 weights to this framework's .npz format.

Capability of the reference's save_vgg_weights.py (10-line torch dump):
given a torch vgg19 checkpoint (state dict of `features.*` tensors, e.g.
downloaded from torchvision on a machine with network access), write an
.npz that highresnet_tpu.models.vgg.VGGFeatureExtractor loads directly.

Usage:
    python -m highresnet_tpu.cli.export_vgg_weights \
        --torch-weights vgg19.pth --out vgg19_conv_layers.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--torch-weights", required=True, help="torch vgg19 state dict (.pth)")
    parser.add_argument("--out", default="vgg19_conv_layers.npz")
    args = parser.parse_args(argv)

    import torch

    state = torch.load(args.torch_weights, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    arrays = {k: v.numpy() for k, v in state.items() if "features" in k or k[0].isdigit()}
    if not arrays:
        raise SystemExit("no conv-stack tensors found in the checkpoint")
    np.savez(args.out, **arrays)
    print(f"wrote {len(arrays)} tensors to {args.out}")

    # round-trip check through the extractor
    from highresnet_tpu.models.vgg import VGGFeatureExtractor

    ex = VGGFeatureExtractor(weights_path=args.out)
    taps = ex(np.zeros((64, 64), np.float32))
    print("loaded OK; tap shapes:", {k: tuple(v.shape) for k, v in taps.items()})


if __name__ == "__main__":
    main()
