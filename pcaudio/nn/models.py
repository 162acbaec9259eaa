"""Model zoo: ST, baseline_ff, CNN_classifier, DeepSet, SetTransformer.

TPU-native (flax.linen) counterparts of the reference architectures:

  * ``ST`` — the paper's set-transformer classifier for 2-D/3-D audio point
    clouds (``/root/reference/Code/models.py:13-44``);
  * ``BaselineFF`` — the framewise feed-forward baseline, including its
    double-softmax quirk (``Code/models.py:47-88``);
  * ``CNNClassifier`` — the temporal CNN baseline (``Code/models.py:91-119``);
  * ``DeepSet`` / ``SetTransformer`` — the vendored generic models
    (``set_transformer-master/models.py:3-44``, ModelNet40 variant with
    dropout at ``set_transformer-master/main_pointcloud.py:13-37``).

All set models take an optional point-validity ``mask`` so fixed-budget padded
clouds produce identical logits to the reference's exact-size clouds.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pcaudio.nn.attention import ISAB, PMA, SAB, torch_dense

Array = jax.Array


class ST(nn.Module):
    """Set Transformer classifier (``Code/models.py:13-44``).

    enc = ISAB × 2;  dec = PMA(num_outputs seeds) → Dense(dim_output).
    Output is ``[B, dim_output]`` when ``num_outputs == 1`` (the reference
    ``.squeeze()`` at ``Code/models.py:44``), else ``[B, num_outputs,
    dim_output]``.
    """

    dim_input: int = 2
    num_outputs: int = 1
    dim_output: int = 10
    num_inds: int = 4
    dim_hidden: int = 4
    num_heads: int = 2
    ln: bool = False
    dtype: Optional[jnp.dtype] = None
    fused_attn: bool = False

    @nn.compact
    def __call__(self, X: Array, mask: Optional[Array] = None) -> Array:
        x = ISAB(self.dim_hidden, self.num_heads, self.num_inds, self.ln,
                 self.dtype, self.fused_attn, name="enc_0")(X, mask=mask)
        x = ISAB(self.dim_hidden, self.num_heads, self.num_inds, self.ln,
                 self.dtype, self.fused_attn, name="enc_1")(x, mask=mask)
        x = PMA(self.dim_hidden, self.num_heads, self.num_outputs, self.ln,
                self.dtype, self.fused_attn, name="dec_pma")(x, mask=mask)
        x = torch_dense(self.dim_output, self.dim_hidden, name="dec_out",
                        dtype=self.dtype)(x)
        if self.num_outputs == 1:
            x = x[:, 0, :]
        return x


class BaselineFF(nn.Module):
    """Framewise feed-forward baseline (``Code/models.py:47-88``).

    Dropout on the *input* ("emulate rand sampling", ``Code/models.py:60``),
    Dense+LeakyReLU stack over ``layer_dims``, final Dense to ``nclasses``.
    The reference ends with ``nn.Softmax`` yet trains with CrossEntropyLoss
    (double softmax, ``Code/models.py:75``); ``apply_softmax=True`` reproduces
    that faithfully.
    """

    layer_dims: Sequence[int]  # e.g. (1025, 513, 256): input dim + hidden dims
    nclasses: int = 10
    p: float = 0.5
    apply_softmax: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dropout(rate=self.p, deterministic=deterministic)(x)
        for i, out_size in enumerate(self.layer_dims[1:]):
            x = torch_dense(out_size, self.layer_dims[i], name=f"enc_{i}",
                            dtype=self.dtype)(x)
            x = nn.leaky_relu(x)  # torch LeakyReLU default slope 0.01
        x = torch_dense(self.nclasses, self.layer_dims[-1],
                        name="code_linear", dtype=self.dtype)(x)
        if self.apply_softmax:
            x = jax.nn.softmax(x, axis=-1)
        return x


class CNNClassifier(nn.Module):
    """Temporal CNN baseline (``Code/models.py:91-119``).

    Input ``[B, Nt, Nf]`` log-spectrogram patch.  A single 1→1-channel conv
    with kernel ``(Nt, Nf + 1 - layer_dims[0])`` collapses time (kernel
    ``(10, 1)`` in the shipped config), then a Dense+LeakyReLU stack and a
    final logits layer.  Dropout on the input, as in the reference.
    """

    Nt: int
    Nf: int
    layer_dims: Sequence[int]  # e.g. (512, 256, 100)
    nclass: int = 10
    p: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = nn.Dropout(rate=self.p, deterministic=deterministic)(x)
        x = x[:, None, :, :]  # [B, 1, Nt, Nf]  (NCHW)
        kh = self.Nt
        kw = self.Nf + 1 - self.layer_dims[0]
        w = self.param(
            "cnn_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (1, 1, kh, kw),
            jnp.float32,
        )
        cb = 1.0 / (kh * kw) ** 0.5   # torch Conv2d default bias bound
        b = self.param(
            "cnn_bias",
            lambda key, shape, dt=jnp.float32: jax.random.uniform(
                key, shape, dt, -cb, cb),
            (1,),
            jnp.float32,
        )
        dtype = self.dtype or jnp.float32
        x = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w.astype(dtype),
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b.astype(dtype)
        x = x[:, 0, 0, :]  # [B, layer_dims[0]]
        for i, out_size in enumerate(self.layer_dims[1:]):
            x = torch_dense(out_size, self.layer_dims[i], name=f"enc_{i}",
                            dtype=self.dtype)(x)
            x = nn.leaky_relu(x)
        return torch_dense(self.nclass, self.layer_dims[-1], name="logits",
                           dtype=self.dtype)(x)


class DeepSet(nn.Module):
    """DeepSets baseline (``set_transformer-master/models.py:3-28``):
    per-point MLP encoder → masked mean pool → MLP decoder."""

    dim_input: int
    num_outputs: int
    dim_output: int
    dim_hidden: int = 128
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, X: Array, mask: Optional[Array] = None) -> Array:
        x = X
        for i in range(3):
            fi = self.dim_input if i == 0 else self.dim_hidden
            x = torch_dense(self.dim_hidden, fi, name=f"enc_{i}",
                            dtype=self.dtype)(x)
            x = nn.relu(x)
        x = torch_dense(self.dim_hidden, self.dim_hidden, name="enc_3",
                        dtype=self.dtype)(x)
        if mask is None:
            x = jnp.mean(x, axis=-2)
        else:
            m = mask[..., None].astype(x.dtype)
            x = jnp.sum(x * m, axis=-2) / jnp.maximum(
                jnp.sum(m, axis=-2), jnp.asarray(1.0, x.dtype)
            )
        for i in range(3):
            x = torch_dense(self.dim_hidden, self.dim_hidden, name=f"dec_{i}",
                            dtype=self.dtype)(x)
            x = nn.relu(x)
        x = torch_dense(self.num_outputs * self.dim_output, self.dim_hidden,
                        name="dec_3", dtype=self.dtype)(x)
        return x.reshape(-1, self.num_outputs, self.dim_output)


class SetTransformer(nn.Module):
    """Generic Set Transformer (``set_transformer-master/models.py:30-44``):
    enc ISAB×2; dec PMA → SAB×2 → Dense.

    ``pointcloud_variant=True`` instead reproduces the ModelNet40 classifier
    (``set_transformer-master/main_pointcloud.py:13-37``): dec Dropout → PMA →
    Dropout → Dense, squeezed to ``[B, dim_output]``.
    """

    dim_input: int
    num_outputs: int
    dim_output: int
    num_inds: int = 32
    dim_hidden: int = 128
    num_heads: int = 4
    ln: bool = False
    pointcloud_variant: bool = False
    dropout_rate: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, X: Array, mask: Optional[Array] = None, deterministic: bool = True
    ) -> Array:
        x = ISAB(self.dim_hidden, self.num_heads, self.num_inds, self.ln,
                 self.dtype, name="enc_0")(X, mask=mask)
        x = ISAB(self.dim_hidden, self.num_heads, self.num_inds, self.ln,
                 self.dtype, name="enc_1")(x, mask=mask)
        if self.pointcloud_variant:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(x)
            x = PMA(self.dim_hidden, self.num_heads, self.num_outputs, self.ln,
                    self.dtype, name="dec_pma")(x, mask=mask)
            x = nn.Dropout(rate=self.dropout_rate, deterministic=deterministic)(x)
            x = torch_dense(self.dim_output, self.dim_hidden, name="dec_out",
                            dtype=self.dtype)(x)
            if self.num_outputs == 1:
                x = x[:, 0, :]
            return x
        x = PMA(self.dim_hidden, self.num_heads, self.num_outputs, self.ln,
                self.dtype, name="dec_pma")(x, mask=mask)
        x = SAB(self.dim_hidden, self.num_heads, self.ln, self.dtype,
                name="dec_sab_0")(x)
        x = SAB(self.dim_hidden, self.num_heads, self.ln, self.dtype,
                name="dec_sab_1")(x)
        return torch_dense(self.dim_output, self.dim_hidden, name="dec_out",
                           dtype=self.dtype)(x)
