from scade_tpu.data.scene import (
    Scene,
    load_ground_truth_depth,
    load_scene,
    load_scene_processed,
    load_scene_scannet,
)

__all__ = [
    "Scene",
    "load_ground_truth_depth",
    "load_scene",
    "load_scene_processed",
    "load_scene_scannet",
]
