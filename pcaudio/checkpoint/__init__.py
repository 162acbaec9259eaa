from pcaudio.checkpoint.torch_import import (
    load_torch_state_dict,
    strip_module_prefix,
    st_params,
    baseline_ff_params,
    cnn_classifier_params,
    deepset_params,
    set_transformer_params,
    mab_params,
    sab_params,
    isab_params,
    pma_params,
)

__all__ = [
    "load_torch_state_dict", "strip_module_prefix",
    "st_params", "baseline_ff_params", "cnn_classifier_params",
    "deepset_params", "set_transformer_params",
    "mab_params", "sab_params", "isab_params", "pma_params",
]
from pcaudio.checkpoint.torch_export import (
    st_state_dict,
    baseline_ff_state_dict,
    cnn_classifier_state_dict,
    save_pth,
)

__all__ += [
    "st_state_dict", "baseline_ff_state_dict", "cnn_classifier_state_dict",
    "save_pth",
]
