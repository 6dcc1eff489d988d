"""Shared experiment-harness primitives for the examples/ drivers.

Lazy re-exports only — import cost matters on the 1-core host where every
driver start competes with a live TPU feed loop.
"""

_LAZY = {
    "honor_platform_and_cache": "highresnet_tpu.exp.harness",
    "ensure_dataset": "highresnet_tpu.exp.harness",
    "held_out_scenes": "highresnet_tpu.exp.harness",
    "bicubic_x3": "highresnet_tpu.exp.harness",
    "scene_scorer": "highresnet_tpu.exp.harness",
    "overflow_metrics": "highresnet_tpu.exp.harness",
    "paired_stats": "highresnet_tpu.exp.harness",
    "paired_t": "highresnet_tpu.exp.harness",
    "emit_report": "highresnet_tpu.exp.harness",
}

__all__ = sorted(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
