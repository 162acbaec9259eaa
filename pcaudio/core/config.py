"""Typed experiment configs with reference-JSON round-trip.

The reference persists a config JSON next to every checkpoint
(``Code/settransformer.py:136-151`` etc.) and the eval scripts rebuild models
and RNG state from it (``Code/pceval.py:26-47``).  Key names vary between
models — ``numpy_seed`` (FST/FB) vs ``np_seed`` (3ST/CNNTemp), ``layers``
(FB) vs ``layer_dims`` (CNNTemp) — all handled here as legacy aliases.

``ExperimentConfig.to_reference_json`` emits the same schema back (including
the per-architecture key variants) so checkpoints written by this framework
remain loadable by reference-convention tooling.
"""
from __future__ import annotations

import dataclasses
import json
from typing import List, Optional, Sequence


ARCH_FST = "FST (Framewise Set Transformer)"
ARCH_FB = "FB (Framewise Feed Forward Baseline)"
ARCH_3ST = "3ST (Set Transformer Temporal)"
ARCH_CNN = "CNN_Temp (Temporal Baseline CNN)"


@dataclasses.dataclass
class ExperimentConfig:
    """Union of the four reference config schemas."""

    architecture: str = ARCH_FST
    dataset: str = "ESC10"
    epochs: int = 500
    weight_decay: float = 1.0e-3
    learning_rate: float = 1.0e-3
    batch_size: int = 128
    window_size: int = 2048        # Nfft
    hop_factor: float = 0.5
    trim_dB: float = 60
    sampling_rate: int = 44100
    classes: int = 10
    numpy_seed: int = 1
    torch_seed: int = 1
    # set-transformer models (FST/3ST)
    dhidden: Optional[int] = None
    nheads: Optional[int] = None
    ninds: Optional[int] = None
    # temporal models (3ST/CNNTemp)
    Ntemp: Optional[int] = None
    # FB / CNNTemp
    layers: Optional[List[int]] = None
    dropout_prob: Optional[float] = None
    # CNNTemp
    Nt: Optional[int] = None
    Nf: Optional[int] = None
    model_params: Optional[int] = None

    # ---- reference JSON round-trip ----

    @classmethod
    def from_reference_json(cls, path_or_dict) -> "ExperimentConfig":
        d = (json.load(open(path_or_dict))
             if isinstance(path_or_dict, str) else dict(path_or_dict))
        return cls(
            architecture=d.get("architecture", ARCH_FST),
            dataset=d.get("dataset", "ESC10"),
            epochs=d.get("epochs", 500),
            weight_decay=d.get("weight_decay", 1.0e-3),
            learning_rate=d.get("learning_rate", 1.0e-3),
            batch_size=d.get("batch_size", 128),
            window_size=d.get("window_size", 2048),
            hop_factor=d.get("hop_factor", 0.5),
            trim_dB=d.get("trim_dB", 60),
            sampling_rate=d.get("sampling_rate", 44100),
            classes=d.get("classes", 10),
            # legacy alias: numpy_seed (FST/FB) vs np_seed (3ST/CNNTemp)
            numpy_seed=d.get("numpy_seed", d.get("np_seed", 1)),
            torch_seed=d.get("torch_seed", 1),
            dhidden=d.get("dhidden"),
            nheads=d.get("nheads"),
            ninds=d.get("ninds"),
            Ntemp=d.get("Ntemp"),
            # legacy alias: layers (FB) vs layer_dims (CNNTemp)
            layers=d.get("layers", d.get("layer_dims")),
            dropout_prob=d.get("dropout_prob"),
            Nt=d.get("Nt"),
            Nf=d.get("Nf"),
            model_params=d.get("model_params"),
        )

    def to_reference_json(self) -> dict:
        """Emit the per-architecture reference schema (key variants intact)."""
        d = {
            "epochs": self.epochs,
            "weight_decay": self.weight_decay,
            "window_size": self.window_size,
            "hop_factor": self.hop_factor,
            "trim_dB": self.trim_dB,
            "sampling_rate": self.sampling_rate,
            "classes": self.classes,
            "batch_size": self.batch_size,
            "learning_rate": self.learning_rate,
            "dataset": self.dataset,
            "architecture": self.architecture,
            "model_params": self.model_params,
        }
        temporal = self.architecture in (ARCH_3ST, ARCH_CNN)
        if temporal:
            d["Ntemp"] = self.Ntemp
            d["np_seed"] = self.numpy_seed
        else:
            d["numpy_seed"] = self.numpy_seed
        d["torch_seed"] = self.torch_seed
        if self.architecture in (ARCH_FST, ARCH_3ST):
            d.update(dhidden=self.dhidden, nheads=self.nheads, ninds=self.ninds)
        if self.architecture == ARCH_FB:
            d["layers"] = self.layers
            d["dropout_prob"] = self.dropout_prob
        if self.architecture == ARCH_CNN:
            d.update(Nt=self.Nt, Nf=self.Nf, layer_dims=self.layers,
                     dropout_prob=self.dropout_prob)
        return d

    # ---- model construction ----

    def build_model(self, dtype=None, fused_attn: bool = False):
        """Instantiate the flax model this config describes."""
        from pcaudio.nn import ST, BaselineFF, CNNClassifier

        if self.architecture == ARCH_FST:
            return ST(dim_input=2, num_outputs=1, dim_output=self.classes,
                      num_inds=self.ninds, dim_hidden=self.dhidden,
                      num_heads=self.nheads, dtype=dtype, fused_attn=fused_attn)
        if self.architecture == ARCH_3ST:
            return ST(dim_input=3, num_outputs=1, dim_output=self.classes,
                      num_inds=self.ninds, dim_hidden=self.dhidden,
                      num_heads=self.nheads, dtype=dtype, fused_attn=fused_attn)
        if self.architecture == ARCH_FB:
            return BaselineFF(layer_dims=tuple(self.layers),
                              nclasses=self.classes,
                              p=self.dropout_prob or 0.5, dtype=dtype)
        if self.architecture == ARCH_CNN:
            return CNNClassifier(Nt=self.Nt, Nf=self.Nf,
                                 layer_dims=tuple(self.layers),
                                 nclass=self.classes,
                                 p=self.dropout_prob or 0.5, dtype=dtype)
        raise ValueError(f"unknown architecture {self.architecture!r}")

    def import_torch_checkpoint(self, pth_path: str):
        """Load the matching reference ``.pth`` into flax params."""
        from pcaudio import checkpoint as ckpt

        sd = ckpt.load_torch_state_dict(pth_path)
        if self.architecture in (ARCH_FST, ARCH_3ST):
            return ckpt.st_params(sd)
        if self.architecture == ARCH_FB:
            return ckpt.baseline_ff_params(sd, num_hidden=len(self.layers) - 1)
        if self.architecture == ARCH_CNN:
            return ckpt.cnn_classifier_params(sd, num_hidden=len(self.layers) - 1)
        raise ValueError(f"unknown architecture {self.architecture!r}")
