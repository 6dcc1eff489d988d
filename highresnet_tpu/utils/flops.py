"""Analytic FLOPs accounting for HRNet forwards (perf observability).

Counts multiply-add FLOPs (2 * MACs) of the conv/matmul path for a given
network config and input geometry; bench.py divides measured step time by
this to report achieved TFLOP/s and MXU utilization.
"""

from __future__ import annotations

from typing import Any, Dict

# v5e single-chip MXU peaks used as the utilization basis. bf16: ~197
# dense TOPS. f32: XLA lowers f32 convs to 3-pass bf16 on the MXU
# (precision ~f32; torch-parity tests pass at 1e-4 under it), so the
# EXECUTION peak for f32 matmul work is 197/3 ~ 65.7 TFLOP/s — measured
# f32 inference hits 52-65 TF/s, i.e. it saturates exactly this basis.
# Round-2 reported f32 "utilization" against the 49 TF/s nominal-f32
# number, which read as 1.33 (>1); this basis keeps every utilization
# in [0, 1] and each bench row carries `peak_basis_tflops_per_s` so the
# denominator is explicit.
V5E_PEAK_TFLOPS = {"float32": 197.0 / 3.0, "bfloat16": 197.0}
V5E_NOMINAL_F32_TFLOPS = 49.0  # classic dense-f32 spec number, for reference


def conv_flops(h: int, w: int, cin: int, cout: int, k: int = 3) -> float:
    return 2.0 * h * w * cin * cout * k * k


def hrnet_forward_flops(config: Dict[str, Any], batch: int, views: int, size: int) -> float:
    """Total forward FLOPs for (batch, views, size, size) inputs."""
    enc = config.get("encoder", {})
    rec = config.get("recursive", {})
    dec = config.get("decoder", {})
    c = enc.get("channel_size", 64)
    k = enc.get("kernel_size", 3)
    n_res = enc.get("num_layers", 2)
    cin = enc.get("in_channels", 2)

    per_image = conv_flops(size, size, cin, c, k)  # init conv
    per_image += n_res * 2 * conv_flops(size, size, c, c, k)  # res blocks
    per_image += conv_flops(size, size, c, c, k)  # final conv
    total = batch * views * per_image

    # fusion tree: sum over halving rounds of (B * half) fuse blocks
    cf = rec.get("in_channels", c)
    kf = rec.get("kernel_size", 3)
    nviews = views
    while nviews // 2 > 0:
        half = nviews // 2
        fuse_per = 2 * conv_flops(size, size, 2 * cf, 2 * cf, kf) + conv_flops(
            size, size, 2 * cf, cf, kf
        )
        total += batch * half * fuse_per
        nviews = half

    # decoder: per-pixel matmul C -> 9*C (== deconv k3 s3) + 1x1 conv at 3x res
    dd = dec.get("deconv", {})
    df = dec.get("final", {})
    s = dd.get("stride", 3)
    cd = dd.get("out_channels", c)
    total += batch * 2.0 * size * size * cf * cd * s * s
    total += batch * conv_flops(s * size, s * size, cd, df.get("out_channels", 1),
                                df.get("kernel_size", 1))
    return total


def shiftnet_forward_flops(batch: int, size: int = 128) -> float:
    """ShiftNet conv stack + fc FLOPs per forward (one pair per scene).

    Architecture per the reference (src/DeepNetworks/ShiftNet.py:6-90):
    8 conv3x3 layers widths [64,64,64,64,128,128,128,128], 2x maxpool
    after layers 2/4/6, fc 32768->1024->2.
    """
    widths = [64, 64, 64, 64, 128, 128, 128, 128]
    pools = [False, True, False, True, False, True, False, False]
    cin, s = 2, size
    total = 0.0
    for ch, pool in zip(widths, pools):
        total += conv_flops(s, s, cin, ch)
        cin = ch
        if pool:
            s //= 2
    total += 2.0 * (cin * s * s) * 1024 + 2.0 * 1024 * 2  # fc1 + fc2
    return batch * total


def lanczos_warp_flops(batch: int, size: int, n: int = 7) -> float:
    """Separable n-tap warp: two 1-D FMA passes over (size, size)."""
    return batch * 2.0 * (2.0 * n * size * size)


def train_step_flops(
    config: Dict[str, Any],
    batch: int,
    views: int,
    patch: int,
    register_size: int = 128,
) -> float:
    """Full registered train step (BASELINE.json config #3).

    forward + backward ~ 3x forward for the conv stacks (grads w.r.t.
    inputs and weights each cost ~1 forward); the optimizer update and
    loss reductions are O(params + pixels) — negligible next to TFLOPs.
    """
    fwd = (
        hrnet_forward_flops(config, batch, views, patch)
        + shiftnet_forward_flops(batch, register_size)
        + lanczos_warp_flops(batch, 3 * patch)
    )
    return 3.0 * fwd


def eval_step_flops(config: Dict[str, Any], batch: int, views: int, size: int) -> float:
    """Validation step: SR forward + on-device 7x7 integer shift search.

    The search evaluates 49 bias-corrected masked MSEs over the trimmed
    (3*size - 2*border)^2 window (ops/metrics.py::shift_cpsnr); each
    placement costs ~7 elementwise ops/pixel (diff, mask product, bias
    reduction, centered square, masked sum). Elementwise (VPU) work, not
    MXU — counted so the row's achieved-TFLOP/s is an honest total, with
    the forward still dominating.
    """
    hr_trim = 3 * size - 2 * 3
    search = batch * 49.0 * 7.0 * hr_trim * hr_trim
    return hrnet_forward_flops(config, batch, views, size) + search


def utilization(flops: float, seconds: float, dtype: str = "float32") -> Dict[str, float]:
    peak = V5E_PEAK_TFLOPS.get(dtype, V5E_PEAK_TFLOPS["float32"])
    if seconds <= 0:  # broken two-point slope (relay noise) — no fake numbers
        return {
            "achieved_tflops_per_s": None,
            "mxu_utilization": None,
            "peak_basis_tflops_per_s": round(peak, 1),
        }
    tflops = flops / seconds / 1e12
    out = {
        "achieved_tflops_per_s": round(tflops, 2),
        "mxu_utilization": round(tflops / peak, 3),
        "peak_basis_tflops_per_s": round(peak, 1),
    }
    if tflops > peak:
        # a reading above the stated execution basis is physically
        # impossible — the measured step time is too short (relay timing
        # jitter); publish the number but mark it untrustworthy
        out["timing_suspect"] = True
    return out
