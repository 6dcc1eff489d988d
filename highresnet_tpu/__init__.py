"""highresnet_tpu — TPU-native multi-frame super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gwall-ceres/HighRes-net (multi-frame super-resolution for ESA Proba-V):

- ``models``       HRNet (encoder / recursive fusion / depth-to-space decoder),
                   ShiftNet sub-pixel registration, VGG feature extractor.
- ``ops``          Lanczos shift resampling, cPSNR/cMSE losses, shift-search
                   metrics, masked registration metrics (NCC/SSIM/MI/...).
- ``data``         Proba-V scene discovery, clearance-weighted sampling,
                   static-shape collation, host-side prefetch pipeline.
- ``train``        pjit train step over a device mesh, plateau LR schedule,
                   Orbax checkpoint/resume.
- ``eval``         registered scoring (shift_cPSNR), ESA-ratio benchmark,
                   Kelvin submission writer.
- ``parallel``     mesh construction + sharding rules (data / view axes).
- ``registration`` coarse-to-fine shift search + headless registration API.

Everything on the compute path is functional, statically shaped, and jittable.
"""

__version__ = "0.1.0"

_TOP_LEVEL = {
    # name -> (module, attribute)
    "HRNet": ("highresnet_tpu.models.hrnet", "HRNet"),
    "ShiftNet": ("highresnet_tpu.models.shiftnet", "ShiftNet"),
    "Model": ("highresnet_tpu.eval.evaluator", "Model"),
    "load_data": ("highresnet_tpu.eval.evaluator", "load_data"),
    "load_config": ("highresnet_tpu.config", "load_config"),
    "train_and_get_best_model": ("highresnet_tpu.train.loop", "train_and_get_best_model"),
    "RegistrationSession": ("highresnet_tpu.registration.session", "RegistrationSession"),
}


def __getattr__(name):
    """Lazy top-level API: `from highresnet_tpu import Model, load_data, ...`
    without paying the full import graph at package import time."""
    try:
        module, attr = _TOP_LEVEL[name]
    except KeyError:
        raise AttributeError(f"module 'highresnet_tpu' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), attr)


def __dir__():
    return sorted(list(globals()) + list(_TOP_LEVEL))
