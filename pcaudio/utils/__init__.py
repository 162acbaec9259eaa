from pcaudio.utils.params import count_parameters, named_parameters

__all__ = ["count_parameters", "named_parameters"]
