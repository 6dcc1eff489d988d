from highresnet_tpu.ops.lanczos import lanczos_kernel, lanczos_shift
from highresnet_tpu.ops.losses import cpsnr_loss, crop_mask, masked_mse_loss, registered_loss
from highresnet_tpu.ops.metrics import cpsnr, shift_cpsnr, shift_cpsnr_batch

__all__ = [
    "lanczos_kernel",
    "lanczos_shift",
    "cpsnr_loss",
    "masked_mse_loss",
    "registered_loss",
    "crop_mask",
    "cpsnr",
    "shift_cpsnr",
    "shift_cpsnr_batch",
]
