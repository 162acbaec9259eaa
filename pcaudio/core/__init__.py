from pcaudio.core.types import PointCloud

__all__ = ["PointCloud"]
