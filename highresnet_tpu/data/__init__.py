from highresnet_tpu.data.probav import (
    ImageSet,
    SceneDataset,
    compute_clearance_scores,
    discover_scenes,
    get_patch,
    read_baseline_cpsnr,
    read_imageset,
    sample_clearest,
    save_clearance_scores,
    train_val_split,
)
from highresnet_tpu.data.collate import collate
from highresnet_tpu.data.pipeline import BatchLoader, shard_for_hosts

__all__ = [
    "ImageSet",
    "SceneDataset",
    "collate",
    "compute_clearance_scores",
    "discover_scenes",
    "get_patch",
    "read_baseline_cpsnr",
    "read_imageset",
    "sample_clearest",
    "save_clearance_scores",
    "train_val_split",
    "BatchLoader",
    "shard_for_hosts",
]
