"""Torch checkpoint import: reference HRNet.pth / ShiftNet.pth -> flax params.

Migration path for users of the reference implementation: weights trained
with the PyTorch code load directly into this framework's models. Layout
mapping (torch module tree -> flax param tree, with OIHW -> HWIO kernel
transposes):

HRNet (reference src/DeepNetworks/HRNet.py):
  encode.init_layer.{0,1}        -> encode/{init_conv, init_prelu}
  encode.res_layers.N.block.*    -> encode/resN/{conv0, prelu0, conv1, prelu1}
  encode.final.0                 -> encode/final_conv
  fuse.fuse.{0.block.*, 1, 2}    -> fuse/{fuse_res/*, fuse_conv, fuse_prelu}
  decode.deconv.{0,1}            -> decode/{deconv_kernel+bias, deconv_prelu}
     (ConvTranspose2d weight (in, out, kh, kw) -> (kh, kw, in, out);
      valid because kernel == stride makes the deconv a per-pixel matmul)
  decode.final                   -> decode/final_conv

ShiftNet (src/DeepNetworks/ShiftNet.py):
  layerN.0 / layerN.1 (+BN stats) -> convN / bnN (+batch_stats)
  fc1, fc2                        -> fc1, fc2 (weight transposed)
  (fc1 is layout-compatible because ShiftNet flattens channel-major.)

Accepts a path to a .pth file, a torch state dict, or a plain
{key: ndarray} mapping, so torch itself is optional at call time.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        # np.array(..., copy) rather than .numpy(): torch state_dict()
        # returns live buffer REFERENCES, and .numpy() shares their memory —
        # a later forward on the torch model would silently mutate converted
        # BN running stats in place
        a = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        out[k] = np.array(a)
    return out


def _load(state_or_path) -> Dict[str, np.ndarray]:
    if isinstance(state_or_path, (str, bytes)):
        import torch

        return _to_numpy(torch.load(state_or_path, map_location="cpu"))
    return _to_numpy(state_or_path)


def _conv(state, key):
    return {
        "kernel": state[f"{key}.weight"].transpose(2, 3, 1, 0),
        "bias": state[f"{key}.bias"],
    }


def _prelu(state, key):
    return {"alpha": state[f"{key}.weight"].reshape(1)}


def _resblock(state, prefix):
    return {
        "conv0": _conv(state, f"{prefix}.block.0"),
        "prelu0": _prelu(state, f"{prefix}.block.1"),
        "conv1": _conv(state, f"{prefix}.block.2"),
        "prelu1": _prelu(state, f"{prefix}.block.3"),
    }


def hrnet_params_from_torch(state_or_path, num_res_layers: int = 2) -> Dict[str, Any]:
    """Convert a reference HRNet state dict to this framework's param tree."""
    s = _load(state_or_path)
    encode: Dict[str, Any] = {
        "init_conv": _conv(s, "encode.init_layer.0"),
        "init_prelu": _prelu(s, "encode.init_layer.1"),
        "final_conv": _conv(s, "encode.final.0"),
    }
    for i in range(num_res_layers):
        encode[f"res{i}"] = _resblock(s, f"encode.res_layers.{i}")

    fuse = {
        "fuse_res": _resblock(s, "fuse.fuse.0"),
        "fuse_conv": _conv(s, "fuse.fuse.1"),
        "fuse_prelu": _prelu(s, "fuse.fuse.2"),
    }

    decode = {
        # ConvTranspose2d weight is (in, out, kh, kw) -> (kh, kw, in, out)
        "deconv_kernel": s["decode.deconv.0.weight"].transpose(2, 3, 0, 1),
        "deconv_bias": s["decode.deconv.0.bias"],
        "deconv_prelu": _prelu(s, "decode.deconv.1"),
        "final_conv": _conv(s, "decode.final"),
    }
    return {"encode": encode, "fuse": fuse, "decode": decode}


def shiftnet_from_torch(state_or_path):
    """Convert a reference ShiftNet state dict.

    Returns (params, batch_stats) — BN running statistics go to the
    batch_stats collection.
    """
    s = _load(state_or_path)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(1, 9):
        params[f"conv{i}"] = _conv(s, f"layer{i}.0")
        params[f"bn{i}"] = {
            "scale": s[f"layer{i}.1.weight"],
            "bias": s[f"layer{i}.1.bias"],
        }
        stats[f"bn{i}"] = {
            "mean": s[f"layer{i}.1.running_mean"],
            "var": s[f"layer{i}.1.running_var"],
        }
    params["fc1"] = {"kernel": s["fc1.weight"].T, "bias": s["fc1.bias"]}
    params["fc2"] = {"kernel": s["fc2.weight"].T}
    return params, stats


def load_reference_checkpoint(hrnet_path: str, shiftnet_path: str | None = None):
    """Load HRNet.pth (+ optional ShiftNet.pth) into the joint param layout
    used by the train state / checkpoints."""
    hr = hrnet_params_from_torch(hrnet_path)
    if shiftnet_path is None:
        return {"params": {"hrnet": hr}, "batch_stats": {}}
    sn, stats = shiftnet_from_torch(shiftnet_path)
    return {"params": {"hrnet": hr, "shiftnet": sn}, "batch_stats": stats}
