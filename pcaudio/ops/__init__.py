from pcaudio.ops.cloud import freq_coords, time_coords, frame_cloud, grid_cloud
from pcaudio.ops.subsample import (
    top_k_points,
    rand_k_points,
    top_k_points_masked,
    rand_k_points_masked,
    top_k_replace,
    rand_k_replace,
    grid_top_k_replace,
    importance_heatmap,
    importance_indices,
    importance_sample_cloud,
)

__all__ = [
    "freq_coords", "time_coords", "frame_cloud", "grid_cloud",
    "top_k_points", "rand_k_points", "top_k_points_masked",
    "rand_k_points_masked", "top_k_replace", "rand_k_replace",
    "grid_top_k_replace", "importance_heatmap", "importance_indices",
    "importance_sample_cloud",
]
