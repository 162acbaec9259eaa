from pcaudio.eval.pipeline import (
    TemporalPipelineConfig,
    extract_chunk_clouds,
    make_temporal_classifier,
    make_chunk_logits,
)

__all__ = [
    "TemporalPipelineConfig", "extract_chunk_clouds",
    "make_temporal_classifier", "make_chunk_logits",
]
