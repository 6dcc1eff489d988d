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
