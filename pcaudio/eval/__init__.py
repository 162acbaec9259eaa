from pcaudio.eval.experiments import (
    framewise_expt1,
    framewise_expt2,
    temporal_expt1,
    temporal_expt2,
    rebut_importance_expt,
    make_fst_frame_classifier,
    make_fb_frame_classifier,
    make_3st_chunk_classifier,
    make_cnn_chunk_classifier,
    make_cloud_classifier,
    default_list_N,
    default_list_Fs,
    default_list_K,
)
from pcaudio.eval.pipeline import (
    TemporalPipelineConfig,
    extract_chunk_clouds,
    make_temporal_classifier,
    make_chunk_logits,
)

__all__ = [
    "TemporalPipelineConfig", "extract_chunk_clouds",
    "make_temporal_classifier", "make_chunk_logits",
    "framewise_expt1", "framewise_expt2", "temporal_expt1", "temporal_expt2",
    "rebut_importance_expt", "make_fst_frame_classifier",
    "make_fb_frame_classifier", "make_3st_chunk_classifier",
    "make_cnn_chunk_classifier", "make_cloud_classifier",
    "default_list_N", "default_list_Fs", "default_list_K",
]
