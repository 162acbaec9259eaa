from pcaudio.bench.flops_calc import (
    mab_flops,
    isab_flops,
    pma_flops,
    st_flops,
    baseline_ff_flops,
    cnn_classifier_flops,
    stft_flops,
    pipeline_flops_per_clip,
    measured_flops,
)

__all__ = [
    "mab_flops", "isab_flops", "pma_flops", "st_flops",
    "baseline_ff_flops", "cnn_classifier_flops", "stft_flops",
    "pipeline_flops_per_clip", "measured_flops",
]
