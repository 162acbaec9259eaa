"""Core data structures for the TPU-native point-cloud-audio framework.

The reference (SubramaniKrishna/point-cloud-audio) represents point clouds as
exact-size numpy arrays built per-sample on the host
(``Code/dataset.py:50-54``, ``Code/dataset.py:161-166``).  XLA wants static
shapes, so the TPU-native representation is a *fixed-budget padded* cloud with
an explicit validity mask: all device code is batched, masked, and jittable.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PointCloud:
    """A batch of fixed-budget point clouds.

    Attributes:
      points: ``[B, K, d]`` float array.  ``d`` is 2 for framewise clouds
        ``(f_norm, log_mag)`` (reference ``Code/dataset.py:50-54``) and 3 for
        temporal clouds ``(f_norm, t_sec, log_mag)`` (``Code/dataset.py:161-166``).
      mask: ``[B, K]`` bool array; True for valid points, False for padding.
      labels: optional ``[B]`` int array of class labels.
    """

    points: jax.Array
    mask: jax.Array
    labels: Optional[jax.Array] = None

    @property
    def batch_size(self) -> int:
        return self.points.shape[0]

    @property
    def budget(self) -> int:
        return self.points.shape[1]

    @property
    def dim(self) -> int:
        return self.points.shape[2]

    def num_valid(self) -> jax.Array:
        """Number of valid points per cloud, ``[B]``."""
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @classmethod
    def full(cls, points: jax.Array, labels: Optional[jax.Array] = None) -> "PointCloud":
        """Wrap a dense cloud where every point is valid."""
        mask = jnp.ones(points.shape[:2], dtype=bool)
        return cls(points=points, mask=mask, labels=labels)

    def pad_to(self, budget: int) -> "PointCloud":
        """Pad (or truncate) the point budget to ``budget``."""
        b, k, d = self.points.shape
        if budget == k:
            return self
        if budget < k:
            return PointCloud(
                points=self.points[:, :budget],
                mask=self.mask[:, :budget],
                labels=self.labels,
            )
        pts = jnp.pad(self.points, ((0, 0), (0, budget - k), (0, 0)))
        msk = jnp.pad(self.mask, ((0, 0), (0, budget - k)))
        return PointCloud(points=pts, mask=msk, labels=self.labels)
