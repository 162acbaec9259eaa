from pcaudio.nn.attention import MAB, SAB, ISAB, PMA, masked_softmax
from pcaudio.nn.models import (
    ST,
    BaselineFF,
    CNNClassifier,
    DeepSet,
    SetTransformer,
)

__all__ = [
    "MAB", "SAB", "ISAB", "PMA", "masked_softmax",
    "ST", "BaselineFF", "CNNClassifier", "DeepSet", "SetTransformer",
]
