from pcaudio.tasks.clustering import (
    ClusteringConfig,
    sample_mog,
    mog_log_likelihood,
    parse_raw,
)
from pcaudio.tasks.modelnet40 import ModelNet40Config
from pcaudio.tasks.max_regression import SmallSetTransformer, SmallDeepSet

__all__ = [
    "ClusteringConfig", "sample_mog", "mog_log_likelihood", "parse_raw",
    "ModelNet40Config", "SmallSetTransformer", "SmallDeepSet",
]
