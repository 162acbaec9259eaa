from pcaudio.utils.params import count_parameters, named_parameters

__all__ = ["count_parameters", "named_parameters"]
from pcaudio.utils.metrics import (
    MetricsWriter, read_metrics, dump_reference_json, dump_with_provenance,
)
from pcaudio.utils.profiling import device_sync, time_fn, trace
from pcaudio.utils.debugging import (
    enable_nan_debugging,
    assert_finite_tree,
    check_jit_purity,
)

__all__ += [
    "MetricsWriter", "read_metrics", "dump_reference_json",
    "dump_with_provenance",
    "device_sync", "time_fn", "trace",
    "enable_nan_debugging", "assert_finite_tree", "check_jit_purity",
]
