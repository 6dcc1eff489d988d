from highresnet_tpu.models.hrnet import HRNet, Decoder, Encoder, FusionNet, ResidualBlock
from highresnet_tpu.models.shiftnet import ShiftNet, register_views, apply_shifts

__all__ = [
    "HRNet",
    "Encoder",
    "FusionNet",
    "Decoder",
    "ResidualBlock",
    "ShiftNet",
    "register_views",
    "apply_shifts",
]
