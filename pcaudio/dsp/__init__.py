from pcaudio.dsp.featurize import (
    FeaturizeConfig,
    featurize_clip,
    featurize_batch,
    temporal_chunks,
    batched_temporal_chunks,
    featurized_max_frames,
)
from pcaudio.dsp.resample import resample, batched_resample, resample_length
from pcaudio.dsp.stft import stft_logmag, batched_stft_logmag, hann_periodic, stft_window
from pcaudio.dsp.trim import trim, trim_bounds, frame_power

__all__ = [
    "FeaturizeConfig", "featurize_clip", "featurize_batch",
    "temporal_chunks", "batched_temporal_chunks", "featurized_max_frames",
    "resample", "batched_resample", "resample_length",
    "stft_logmag", "batched_stft_logmag", "hann_periodic", "stft_window",
    "trim", "trim_bounds", "frame_power",
]
